"""ClipCap executor: GPT-2 + mapper trained/evaluated on VQA2.

Mirrors reference: src/trainers/clipcap_exector.py:42-395 — pad=eos;
training labels mask everything up to and including BOS so the loss covers
only the answer segment (+ the first pad as EOS, reference :132-171);
generation is greedy from [prefix; prompt] and predictions are the decoded
text after the BOS token (reference :245-265).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clipcap import clipcap_loss
from ..registry import EXECUTORS
from ..utils.attr_dict import AttrDict
from .base_executor import BaseExecutor
from .few_shot_vqa_executor import TABLE_COLUMNS
from .model_factory import build_model_from_config
from .optimization import make_optimizer

logger = logging.getLogger(__name__)


@EXECUTORS.register()
class ClipCapExecutor(BaseExecutor):
    def __init__(self, config: Any, data_loader: Any):
        super().__init__(config, data_loader)
        if getattr(self.tokenizer, "pad_token", None) is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token
            self.tokenizer.pad_token_id = self.tokenizer.eos_token_id
        self.model, _ = build_model_from_config(config)
        self._maybe_resize_embeddings()
        self._setup_mesh(self.model)
        steps_per_epoch = max(len(data_loader.train_dataloader or []), 1) \
            if data_loader.train_dataloader is not None else 1000
        total_steps = steps_per_epoch * min(
            int(config.train.get("epochs", 1)), 1000
        )
        self.tx, self.schedule = make_optimizer(config, total_steps)
        self.opt_state = self.tx.init(self.model.params["mapper"])
        self._train_step = self._build_train_step()

    def _maybe_resize_embeddings(self) -> None:
        """Grow the (tied) token embedding table when special tokens were
        added to the tokenizer (reference: clipcap_exector.py:55-56
        resize_token_embeddings)."""
        import dataclasses

        try:
            needed = len(self.tokenizer)
        except TypeError:
            return
        cfg = self.model.cfg
        if needed <= cfg.lm.vocab_size:
            return
        import numpy as np

        wte = np.asarray(self.model.params["lm"]["wte"], dtype=np.float32)
        extra = np.random.default_rng(0).normal(
            0, 0.02, size=(needed - wte.shape[0], wte.shape[1])
        ).astype(np.float32)
        new_wte = jnp.asarray(
            np.concatenate([wte, extra]), dtype=jnp.asarray(wte).dtype
        )
        self.model.params["lm"]["wte"] = new_wte.astype(
            self.model.params["lm"]["wpe"].dtype
        )
        self.model.cfg = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, vocab_size=needed)
        )
        logger.info("resized token embeddings to %d", needed)

    def _build_train_step(self):
        cfg = self.model.cfg
        tx = self.tx

        @jax.jit
        def step(mapper_params, opt_state, lm_params, prefix, input_ids,
                 mask, labels):
            loss, grads = jax.value_and_grad(clipcap_loss)(
                mapper_params, lm_params, cfg, prefix, input_ids, mask,
                labels,
            )
            updates, opt_state = tx.update(grads, opt_state, mapper_params)
            mapper_params = optax.apply_updates(mapper_params, updates)
            return mapper_params, opt_state, loss

        return step

    # ------------------------------------------------------------------
    def _answer_labels(self, input_ids: np.ndarray) -> np.ndarray:
        """Mask labels so loss covers only tokens after BOS, keeping the
        first pad as EOS (reference: clipcap_exector.py:132-156)."""
        pad_id = self.tokenizer.pad_token_id
        bos_id = self.tokenizer.bos_token_id
        labels = input_ids.astype(np.int64).copy()
        is_pad = labels == pad_id
        is_bos = labels == bos_id
        # first BOS per row; positions <= bos are masked
        has_bos = is_bos.any(axis=1)
        bos_pos = np.where(has_bos, is_bos.argmax(axis=1),
                           labels.shape[1])
        col = np.arange(labels.shape[1])[None, :]
        before_or_at_bos = col <= bos_pos[:, None]
        # first pad per row: keep as pad (EOS); pads after that -> -100
        has_pad = is_pad.any(axis=1)
        first_pad = np.where(has_pad, is_pad.argmax(axis=1), labels.shape[1])
        after_first_pad = is_pad & (col > first_pad[:, None])
        out = labels.copy()
        out[before_or_at_bos] = -100
        out[is_pad] = pad_id
        out[after_first_pad] = -100
        # pads before BOS stay masked (left padding case)
        out[before_or_at_bos & is_pad] = -100
        return out

    def training_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        input_ids = np.asarray(batch.input_ids)
        labels = self._answer_labels(input_ids)
        clip = np.asarray(batch.clip_embeddings)
        if clip.ndim == 3:
            clip = clip[:, -1]
        mapper, self.opt_state, loss = self._train_step(
            self.model.params["mapper"], self.opt_state,
            self.model.params["lm"], jnp.asarray(clip),
            jnp.asarray(input_ids), jnp.asarray(batch.attention_mask),
            jnp.asarray(labels),
        )
        self.model.params["mapper"] = mapper
        return {"loss": loss}

    def trainable_state(self) -> Dict[str, Any]:
        return {
            "mapper": self.model.params["mapper"],
            "opt_state": self.opt_state,
        }

    def load_trainable_state(self, state: Dict[str, Any]) -> None:
        self.model.params["mapper"] = self._replicate_loaded(
            state["mapper"]
        )

    # ------------------------------------------------------------------
    def _generative_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        """Greedy generation; prediction = decoded text after BOS
        (reference: clipcap_exector.py:213-311)."""
        input_ids = jnp.asarray(batch.generative_input_ids)
        mask = jnp.asarray(batch.generative_attention_mask)
        clip = np.asarray(batch.clip_embeddings)
        if clip.ndim == 3:
            clip = clip[:, -1]
        tokens, _ = self.model.generate(
            jnp.asarray(clip), input_ids, mask,
            max_new_tokens=int(
                self.config.data_loader.additional.max_target_length
            ),
            eos_token_id=self.tokenizer.eos_token_id,
        )
        tokens_np = np.asarray(tokens)
        valid = np.asarray(
            batch.get("sample_valid", np.ones(len(tokens_np), dtype=bool))
        )
        bos_id = self.tokenizer.bos_token_id
        predictions, table_entries = [], []
        lookup = self.data_loader.data.vqa_data.lookup
        for index, question_id in enumerate(batch.question_ids):
            if index >= len(tokens_np) or not valid[index]:
                continue
            seq = tokens_np[index].tolist()
            if bos_id is not None and bos_id in seq:
                seq = seq[seq.index(bos_id):]
            decoded = self.decoder_tokenizer.decode(
                seq, skip_special_tokens=True
            ).strip()
            predictions.append(
                {"question_id": question_id, "answer": decoded}
            )
            item = lookup[str(question_id)]
            table_entries.append([
                question_id, item["img_key"], item["question"],
                self.tokenizer.decode(np.asarray(input_ids[index]).tolist()),
                item["answers"], item["gold_answer"], decoded,
            ])
        return {
            "predictions": predictions,
            "question_ids": list(batch.question_ids),
            "answers": list(batch.answers),
            "table_entries": table_entries,
        }

    def evaluate_outputs(self, step_outputs: List[Dict],
                         mode: str = "test") -> AttrDict:
        predictions: List[Dict] = []
        rows: List[List] = []
        for i, out in enumerate(step_outputs):
            predictions.extend(out["predictions"])
            if i < 10:
                rows.extend(out["table_entries"])
        data = AttrDict(
            mode=mode, epoch=self.current_epoch,
            batch_predictions=predictions,
        )
        log_dict = self.compute_metrics(data)
        log_dict.artifacts["test_table"] = {
            "columns": TABLE_COLUMNS, "rows": rows,
        }
        return log_dict
