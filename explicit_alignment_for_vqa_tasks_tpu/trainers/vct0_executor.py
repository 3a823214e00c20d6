"""VCT0 mapping-network training on Conceptual Captions.

Mirrors reference: src/trainers/vct0_exector.py:40-354 — captioning loss
``model(prefix=clip_embeddings, labels)`` on the frozen LM; validation
logs the loss every batch but only generates captions for the first 6
batches (reference :185-218). The train step is one jitted function over
the mapper params + optax state.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vct0 import vct0_caption_loss
from ..registry import EXECUTORS
from ..utils.attr_dict import AttrDict
from .base_executor import BaseExecutor
from .model_factory import build_model_from_config
from .optimization import make_optimizer

logger = logging.getLogger(__name__)

CAPTION_TABLE_COLUMNS = ["image_url", "gold_caption", "predicted_caption"]
NUM_CAPTION_GEN_BATCHES = 6


@EXECUTORS.register()
class VCT0Executor(BaseExecutor):
    def __init__(self, config: Any, data_loader: Any):
        super().__init__(config, data_loader)
        self.model, _ = build_model_from_config(config)
        self._setup_mesh(self.model)
        steps_per_epoch = max(len(data_loader.train_dataloader or []), 1) \
            if data_loader.train_dataloader is not None else 1000
        total_steps = steps_per_epoch * min(
            int(config.train.get("epochs", 1)), 1000
        )
        self.tx, self.schedule = make_optimizer(config, total_steps)
        self.opt_state = self.tx.init(self.model.params["mapper"])
        self._train_step = self._build_train_step()
        self._eval_loss = self._build_eval_loss()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        cfg = self.model.cfg
        tx = self.tx
        loss_fn = self._loss_fn()

        @jax.jit
        def step(mapper_params, opt_state, lm_params, clip, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                mapper_params, lm_params, cfg, clip, labels
            )
            updates, opt_state = tx.update(grads, opt_state, mapper_params)
            mapper_params = optax.apply_updates(mapper_params, updates)
            return mapper_params, opt_state, loss

        return step

    def _loss_fn(self):
        """Captioning loss; the GPipe twin when a (data, pipe, model) mesh
        is active (config tpu.mesh.pipe > 1, parallel/pipeline.py)."""
        if not self.pipelined:
            return vct0_caption_loss
        from ..parallel.pipeline import vct0_caption_loss_pp

        mesh, n_micro = self.mesh, self.n_micro
        sp = self.sequence_parallel

        def loss_fn(mapper_params, lm_params, cfg, clip, labels):
            return vct0_caption_loss_pp(
                mapper_params, lm_params, cfg, mesh, clip, labels,
                n_micro=n_micro, sequence_parallel=sp,
            )

        return loss_fn

    def _build_eval_loss(self):
        cfg = self.model.cfg
        loss_fn = self._loss_fn()

        @jax.jit
        def eval_loss(mapper_params, lm_params, clip, labels):
            return loss_fn(mapper_params, lm_params, cfg, clip, labels)

        return eval_loss

    def _pad_for_pipeline(self, clip, labels, nominal: int = 0):
        """Pad the batch so the active topology accepts it. Exact: rows
        whose labels are all -100 contribute zero to both the token-CE
        numerator and the valid-token count, so the loss and mapper
        gradients are unchanged.

        Pipelined mesh: pad to a multiple of data x n_micro. GLOBAL
        multi-process mesh: pad to the NOMINAL per-process batch size AND
        pad the label axis to the static max_target_length — every
        process must feed the same local shapes each step
        (multi-controller contract), which a short last loader shard or
        the collate's pad-to-longest-in-batch would otherwise break."""
        from ..parallel.mesh import spans_processes

        multiproc = self.mesh is not None and spans_processes(self.mesh)
        target = None
        if self.pipelined:
            mult = self.mesh.shape["data"] * self.n_micro
            base = max(clip.shape[0], nominal if multiproc else 0)
            target = base + ((-base) % mult)
        elif nominal and multiproc:
            target = nominal
        if multiproc:
            # static label length: the collate pads to longest-in-batch,
            # which differs across the processes' shards
            tgt_len = int(
                self.config.data_loader.additional.max_target_length
            )
            if labels.shape[1] < tgt_len:
                labels = jnp.concatenate(
                    [labels, jnp.full(
                        (labels.shape[0], tgt_len - labels.shape[1]),
                        -100, labels.dtype)],
                    axis=1,
                )
        if target is None or clip.shape[0] >= target:
            return clip, labels
        pad = target - clip.shape[0]
        clip = jnp.concatenate(
            [clip, jnp.zeros((pad, *clip.shape[1:]), clip.dtype)], axis=0
        )
        labels = jnp.concatenate(
            [labels, jnp.full((pad, *labels.shape[1:]), -100, labels.dtype)],
            axis=0,
        )
        return clip, labels

    # ------------------------------------------------------------------
    def training_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        clip, labels = self._pad_for_pipeline(
            jnp.asarray(batch.clip_embeddings), jnp.asarray(batch.labels),
            nominal=int(self.config.train.batch_size),
        )
        clip = self._shard(clip)
        labels = self._shard(labels)
        mapper, self.opt_state, loss = self._train_step(
            self.model.params["mapper"], self.opt_state,
            self.model.params["lm"], clip, labels,
        )
        self.model.params["mapper"] = mapper
        if self.global_step % 50 == 0:
            lr = self.schedule(self.global_step) if callable(self.schedule) \
                else self.schedule
            self.log_metrics({"train/lr": float(lr)})
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
        if "opt_state" in state and state["opt_state"] is not None:
            self.opt_state = jax.tree.unflatten(
                jax.tree.structure(self.opt_state),
                jax.tree.leaves(state["opt_state"]),
            )

    # ------------------------------------------------------------------
    def _generative_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        from ..parallel.mesh import spans_processes

        multiproc_mesh = self.mesh is not None and \
            spans_processes(self.mesh)
        clip = jnp.asarray(batch.clip_embeddings)
        labels = jnp.asarray(batch.labels)
        loss_clip, loss_labels = self._pad_for_pipeline(
            clip, labels, nominal=int(self.config.valid.batch_size)
        )
        if multiproc_mesh:
            # global val loss over the union of the process shards
            loss_clip = self._shard(loss_clip)
            loss_labels = self._shard(loss_labels)
        loss = float(self._eval_loss(
            self.model.params["mapper"], self.model.params["lm"],
            loss_clip, loss_labels,
        ))
        out: Dict[str, Any] = {"loss": loss, "table_entries": []}
        if multiproc_mesh:
            # caption generation stays a per-host (use_mesh=False +
            # prediction gather) concern — under a global mesh each
            # process's jit would silently assume its different local
            # batch is replicated
            return out
        if batch_idx < NUM_CAPTION_GEN_BATCHES:
            tokens, _ = self.model.generate(
                prefix=clip[:, None, :],
                max_new_tokens=int(
                    self.config.data_loader.additional.max_target_length
                ),
            )
            captions = [
                self.decoder_tokenizer.decode(
                    t.tolist(), skip_special_tokens=True
                )
                for t in np.asarray(tokens)
            ]
            out["table_entries"] = [
                [url, gold, pred]
                for url, gold, pred in zip(
                    batch.image_urls, batch.captions, captions
                )
            ]
        return out

    def evaluate_outputs(self, step_outputs: List[Dict],
                         mode: str = "test") -> AttrDict:
        losses = [o["loss"] for o in step_outputs if "loss" in o]
        rows: List[List] = []
        for out in step_outputs:
            rows.extend(out.get("table_entries", []))
        log_dict = AttrDict(metrics={}, artifacts={})
        if losses:
            log_dict.metrics["loss"] = float(np.mean(losses))
        log_dict.artifacts["test_table"] = {
            "columns": CAPTION_TABLE_COLUMNS, "rows": rows,
        }
        return log_dict
