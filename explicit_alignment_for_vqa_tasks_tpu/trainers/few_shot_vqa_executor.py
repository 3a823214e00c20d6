"""Few-shot VQA evaluation executor (the flagship path).

Mirrors reference: src/trainers/few_shot_vqa_executor.py:46-416 — greedy
generation over spliced prompts, the three ensemble modes (one-at-a-time
encoder, one-shot ensembling, prompt-permutation ensembling with
sequence-log-prob scoring), prediction decoding, VQA metrics.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.decoding import sequence_scores
from ..registry import EXECUTORS
from ..utils.attr_dict import AttrDict
from .base_executor import BaseExecutor
from .model_factory import build_model_from_config

logger = logging.getLogger(__name__)

TABLE_COLUMNS = [
    "question_id", "image_key", "question", "input", "answers",
    "gold_answer", "prediction",
]


def ensemble_generate(
    model: Any,
    input_ids: jnp.ndarray,        # (B, E, L)
    attention_mask: jnp.ndarray,   # (B, E, L)
    clip_embeddings: jnp.ndarray,
    num_ensembles: int,
    num_shots: Optional[int],
    no_prefix: bool,
    max_new_tokens: int,
    mode: str,
    num_beams: int = 1,
    members_per_call: int = 1,
) -> np.ndarray:
    """Generate per ensemble member, score each sequence by summed token
    log-prob (skipping ids {0,1,2}), argmax-pick
    (reference: few_shot_vqa_executor.py:293-332). num_beams > 1
    composes correctly: beam outputs carry TRUE per-token logprobs
    (ops/decoding.py::beam_search_t5), so sequence_scores ranks ensemble
    members identically for greedy and beam.

    ``members_per_call = m`` (tpu.ensemble_members_per_call; default 1 =
    the reference's per-member loop) stacks m members into the batch
    dimension per generate call: the per-decode-step fixed costs
    amortize over m*B rows and the per-member host sync (the np.asarray
    fetch) drops to ceil(E/m) syncs. Member results are
    row-independent, so predictions match the looped path. m is a
    CAPACITY knob: each call's decode caches grow m-fold, so size it to
    the chip (bf16 cross-KV caps near B=32 total rows at T0-3B flagship
    shapes; the int8 stack fits 64 — docs/scaling.md)."""
    batch = input_ids.shape[0]
    members_per_call = max(1, min(members_per_call, num_ensembles))
    all_tokens, all_scores = [], []
    for start in range(0, num_ensembles, members_per_call):
        chunk = list(range(
            start, min(start + members_per_call, num_ensembles)
        ))
        m = len(chunk)
        if mode == "one_shot":
            # one in-context embedding + the test image per member
            # (reference :298-299); (B, m, 2, prefix_size)
            shots = clip_embeddings[:, chunk[0]:chunk[-1] + 1]
            test_img = jnp.broadcast_to(
                clip_embeddings[:, -1:][:, None],
                (batch, m, 1) + clip_embeddings.shape[2:],
            )
            member_clip = jnp.concatenate(
                [shots[:, :, None], test_img], axis=2
            )
        else:
            # permutation i's full embedding set (reference :301-302)
            member_clip = clip_embeddings[:, chunk[0]:chunk[-1] + 1]
        # fold members into the batch dim: (B, m, ...) -> (B*m, ...)
        member_clip = member_clip.reshape(
            (batch * m,) + member_clip.shape[2:]
        )
        member_ids = input_ids[:, chunk[0]:chunk[-1] + 1].reshape(
            batch * m, input_ids.shape[-1]
        )
        member_mask = attention_mask[:, chunk[0]:chunk[-1] + 1].reshape(
            batch * m, attention_mask.shape[-1]
        )
        tokens, logprobs = model.generate(
            prefix=member_clip,
            question_tokens=member_ids,
            question_mask=member_mask,
            no_prefix=no_prefix,
            num_shots=num_shots,
            max_new_tokens=max_new_tokens,
            num_beams=num_beams,
        )
        scores = sequence_scores(tokens, logprobs)
        tokens_np = np.asarray(tokens).reshape(batch, m, -1)
        scores_np = np.asarray(scores).reshape(batch, m)
        for j in range(m):
            all_tokens.append(tokens_np[:, j])
            all_scores.append(scores_np[:, j])
    scores = np.stack(all_scores, axis=1)         # (B, E)
    best = np.argmax(scores, axis=1)
    stacked = np.stack(all_tokens, axis=1)        # (B, E, T)
    return stacked[np.arange(batch), best]


@EXECUTORS.register()
class FewShotVQAExecutor(BaseExecutor):
    """Eval-only executor: training_step is a no-op
    (reference: few_shot_vqa_executor.py:139-140)."""

    def __init__(self, config: Any, data_loader: Any):
        super().__init__(config, data_loader)
        self.model, self.model_kind = build_model_from_config(config)
        self._setup_mesh(self.model)
        # T5 has no BOS; the reference aliases it to pad
        # (few_shot_vqa_executor.py:62)
        if getattr(self.tokenizer, "bos_token", None) is None:
            self.tokenizer.bos_token = self.tokenizer.pad_token
        # the prefix-splice op keys on <extra_id_i> = sentinel_base - i;
        # a static-shape op cannot assert this under jit, so validate the
        # tokenizer/model agreement host-side once at build time
        model_cfg = getattr(self.model, "cfg", None)
        sentinel_base = getattr(model_cfg, "sentinel_base", None)
        if sentinel_base is not None:
            try:
                tok_base = self.tokenizer.convert_tokens_to_ids(
                    "<extra_id_0>"
                )
            except Exception:
                tok_base = None
            if tok_base is not None and tok_base != sentinel_base:
                raise ValueError(
                    f"tokenizer maps <extra_id_0> to id {tok_base} but the "
                    f"model's sentinel_base is {sentinel_base}; set "
                    "model_config.model_args.sentinel_base to match the "
                    "tokenizer or prefixes will be silently dropped"
                )

    def training_step(self, batch: AttrDict, batch_idx: int):
        return None

    def _maybe_calibrate_int8(self) -> None:
        """Deferred int8 quantization (tpu.int8_calibrate_batches > 0):
        pull the first N eval batches, accumulate SmoothQuant activation
        maxima on the spliced encoder inputs, then quantize the frozen
        LM with the calibrated folding
        (models/vct0.py::calibrate_and_quantize_int8). Runs once."""
        pending = getattr(self.model, "pending_int8_calibration", None)
        if not pending:
            return
        additional = self.config.data_loader.additional
        if additional.get("pass_examples_through_encoder_one_at_a_time", 0) \
                or bool(additional.get("ensemble_one_shots", 0)) \
                or int(additional.get(
                    "num_permutations_of_in_context_examples", 0)):
            raise ValueError(
                "tpu.int8_calibrate_batches supports the main/no_prefix "
                "eval modes; for one-at-a-time/ensemble modes calibrate "
                "via models.t5.calibrate_encoder_act_max and quantize "
                "before building the executor"
            )
        no_prefix = bool(additional.get("no_prefix", 0))
        n = int(pending["batches"])
        feed = []
        for idx, batch in enumerate(self.test_dataloader):
            if idx >= n:
                break
            feed.append({
                "prefix": jnp.asarray(batch.clip_embeddings),
                "question_tokens": jnp.asarray(batch.generative_input_ids),
                "question_mask": jnp.asarray(
                    batch.generative_attention_mask),
                "no_prefix": no_prefix,
            })
        logger.info(
            "int8 SmoothQuant calibration on %d eval batch(es), alpha=%s",
            len(feed), pending["alpha"],
        )
        self.model.calibrate_and_quantize_int8(feed, alpha=pending["alpha"])
        self.model.pending_int8_calibration = None
        self._reshard_lm()

    def trainable_state(self) -> Dict[str, Any]:
        return {"mapper": self.model.params["mapper"]}

    def load_trainable_state(self, state: Dict[str, Any]) -> None:
        self.model.params["mapper"] = self._replicate_loaded(
            state["mapper"]
        )

    # ------------------------------------------------------------------
    def _generative_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        return self._collect_generative(
            self._dispatch_generative(batch, batch_idx)
        )

    def _dispatch_generative(self, batch: AttrDict, batch_idx: int) -> Dict:
        """Enqueue the device work for one eval batch and return its
        (possibly still-executing) arrays — jax async dispatch means no
        fetch happens here for the plain generate paths, so the caller
        can overlap the NEXT batch's device work with this batch's host
        postprocessing (see BaseExecutor._eval_loop)."""
        additional = self.config.data_loader.additional
        max_new = int(additional.max_target_length)
        num_shots = int(additional.get("num_shots", 0))
        one_at_a_time = bool(
            additional.get("pass_examples_through_encoder_one_at_a_time", 0)
        )
        num_perms = int(
            additional.get("num_permutations_of_in_context_examples", 0)
        )
        ensemble_one_shots = bool(additional.get("ensemble_one_shots", 0))
        no_prefix = bool(additional.get("no_prefix", 0))
        num_beams = int(additional.get("num_beams", 1))

        # rows-per-question in the FLAT token arrays, per generate mode
        if one_at_a_time:
            group = num_shots + 1
        elif ensemble_one_shots:
            group = num_shots
        elif num_perms > 0:
            group = num_perms
        else:
            group = 1

        # Pad the last partial batch to a data-axis multiple so it stays
        # SHARDED instead of falling into _shard's replication path (the
        # throughput cliff) — extra rows repeat the final question and are
        # ignored by _collect_generative's metadata-driven loop.
        input_ids, _ = self._pad_rows_to_data_multiple(
            jnp.asarray(batch.generative_input_ids), group
        )
        attention_mask, _ = self._pad_rows_to_data_multiple(
            jnp.asarray(batch.generative_attention_mask), group
        )
        clip_embeddings, _ = self._pad_rows_to_data_multiple(
            jnp.asarray(batch.clip_embeddings)
        )
        input_ids = self._shard(input_ids)
        attention_mask = self._shard(attention_mask)
        clip_embeddings = self._shard(clip_embeddings)

        decoder_input_ids = None
        if "decoder_generative_input_ids" in batch:
            # drop the trailing token like the reference (:182)
            decoder_input_ids, _ = self._pad_rows_to_data_multiple(
                jnp.asarray(batch.decoder_generative_input_ids)[:, :-1]
            )

        if one_at_a_time:
            # flat (B*(k+1), L) -> (B, k+1, L)
            # (reference: few_shot_vqa_executor.py:186-188)
            seg = num_shots + 1
            input_ids = input_ids.reshape(-1, seg, input_ids.shape[-1])
            attention_mask = attention_mask.reshape(
                -1, seg, attention_mask.shape[-1]
            )
            tokens, logprobs = self.model.generate(
                prefix=clip_embeddings,
                question_tokens=input_ids,
                question_mask=attention_mask,
                no_prefix=no_prefix,
                pass_examples_through_encoder_one_at_a_time=True,
                max_new_tokens=max_new,
                num_beams=num_beams,
            )
        elif ensemble_one_shots:
            input_ids = input_ids.reshape(
                -1, num_shots, input_ids.shape[-1]
            )
            attention_mask = attention_mask.reshape(
                -1, num_shots, attention_mask.shape[-1]
            )
            tokens = self.generate_from_ensembles(
                input_ids, attention_mask, clip_embeddings,
                num_ensembles=num_shots, num_shots=1, no_prefix=no_prefix,
                max_new_tokens=max_new, mode="one_shot",
                num_beams=num_beams,
            )
        elif num_perms > 0:
            input_ids = input_ids.reshape(-1, num_perms, input_ids.shape[-1])
            attention_mask = attention_mask.reshape(
                -1, num_perms, attention_mask.shape[-1]
            )
            tokens = self.generate_from_ensembles(
                input_ids, attention_mask, clip_embeddings,
                num_ensembles=num_perms, num_shots=None,
                no_prefix=no_prefix, max_new_tokens=max_new,
                mode="permutation", num_beams=num_beams,
            )
        else:
            tokens, logprobs = self.model.generate(
                prefix=clip_embeddings,
                question_tokens=input_ids,
                question_mask=attention_mask,
                decoder_input_ids=decoder_input_ids,
                no_prefix=no_prefix,
                max_new_tokens=max_new,
                num_beams=num_beams,
            )

        return {
            "tokens": tokens,
            "input_ids": input_ids,
            "batch": batch,
            "batch_idx": batch_idx,
        }

    def _collect_generative(self, state: Dict) -> Dict:
        """Fetch the batch's tokens to host and build predictions/table
        rows (the host half of _generative_step)."""
        tokens = state["tokens"]
        input_ids = state["input_ids"]
        batch = state["batch"]
        batch_idx = state["batch_idx"]

        tokens_np = np.asarray(tokens)
        valid = np.asarray(
            batch.get("sample_valid", np.ones(len(tokens_np), dtype=bool))
        )

        predictions, table_entries = [], []
        lookup = self.data_loader.data.vqa_data.lookup
        for index, question_id in enumerate(batch.question_ids):
            if index >= len(tokens_np) or not valid[index]:
                continue
            decoded = self.decoder_tokenizer.decode(
                tokens_np[index].tolist(), skip_special_tokens=True
            )
            predictions.append(
                {"question_id": question_id, "answer": decoded}
            )
            item = lookup[str(question_id)]
            if input_ids.ndim == 3:
                prompt_ids = np.asarray(input_ids[index]).reshape(-1)
            else:
                prompt_ids = np.asarray(input_ids[index])
            table_entries.append([
                question_id, item["img_key"], item["question"],
                self.tokenizer.decode(prompt_ids.tolist()),
                item["answers"], item["gold_answer"], decoded,
            ])
        if batch_idx < 1 and predictions:
            logger.info(
                "sample prediction: %r <---> gold %r",
                predictions[0]["answer"], batch.gold_answers[0],
            )
        return {
            "predictions": predictions,
            "question_ids": list(batch.question_ids),
            "answers": list(batch.answers),
            "table_entries": table_entries,
        }

    # ------------------------------------------------------------------
    def generate_from_ensembles(
        self,
        input_ids: jnp.ndarray,        # (B, E, L)
        attention_mask: jnp.ndarray,   # (B, E, L)
        clip_embeddings: jnp.ndarray,
        num_ensembles: int,
        num_shots: Optional[int],
        no_prefix: bool,
        max_new_tokens: int,
        mode: str,
        num_beams: int = 1,
    ) -> jnp.ndarray:
        """Delegates to :func:`ensemble_generate` with
        tpu.ensemble_members_per_call from config (default 1 = the
        reference's per-member loop; m > 1 batches m members per
        generate call — see the free function's docstring)."""
        members_per_call = int(
            self.config.get("tpu", {}).get("ensemble_members_per_call", 1)
            or 1
        )
        return ensemble_generate(
            self.model, input_ids, attention_mask, clip_embeddings,
            num_ensembles=num_ensembles, num_shots=num_shots,
            no_prefix=no_prefix, max_new_tokens=max_new_tokens, mode=mode,
            num_beams=num_beams, members_per_call=members_per_call,
        )

    # ------------------------------------------------------------------
    def evaluate_outputs(self, step_outputs: List[Dict],
                         mode: str = "test") -> AttrDict:
        """Aggregate predictions + prediction table, compute metrics
        (reference: few_shot_vqa_executor.py:334-368)."""
        predictions: List[Dict] = []
        rows: List[List] = []
        for i, out in enumerate(step_outputs):
            predictions.extend(out["predictions"])
            if i < 10:
                rows.extend(out["table_entries"])
        # multi-host: VQAEval needs full question coverage on the scoring
        # host (parallel/gather.py; no-op single-process)
        from ..parallel.gather import gather_predictions_to_host0

        predictions = gather_predictions_to_host0(predictions)
        data = AttrDict(
            mode=mode,
            epoch=self.current_epoch,
            batch_predictions=predictions,
        )
        log_dict = self.compute_metrics(data)
        log_dict.artifacts["test_table"] = {
            "columns": TABLE_COLUMNS, "rows": rows,
        }
        return log_dict
