"""BaseExecutor: the run loop (replaces PyTorch-Lightning).

Mirrors the reference's executor contract (reference: src/trainers/
base_executor.py:34-84 + the PL Trainer wiring in src/main.py:85-197):
subclasses implement ``training_step`` / ``_generative_step`` /
``evaluate_outputs``; the base provides the epoch loop, periodic
validation (``valid.step_size`` steps, capped at ``valid.break_interval``
batches), checkpointing every ``train.save_interval`` epochs with
best/last aliases, metric logging with automatic max/min
(reference: base_executor.py:59-71), and a sanity-check validation pass
before training (tolerated metric failures, reference:
metrics_processors.py:435-444).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.attr_dict import AttrDict
from ..utils.loggers import MultiLogger
from .checkpointing import get_checkpoint_model_path, save_checkpoint
from .metrics_processors import MetricsProcessor

logger = logging.getLogger(__name__)


class BaseExecutor(MetricsProcessor):
    def __init__(self, config: Any, data_loader: Any):
        self.config = config
        self.data_loader = data_loader
        self.tokenizer = data_loader.tokenizer
        self.decoder_tokenizer = data_loader.decoder_tokenizer
        self.current_epoch = 0
        self.global_step = 0
        self.in_sanity_check = False
        self.multi_logger: Optional[MultiLogger] = None
        self.mesh = None  # set by _setup_mesh when >1 device is available
        self.pipelined = False  # 3-D (data, pipe, model) GPipe mesh active
        self.n_micro = 1
        self.sequence_parallel = False

    def _setup_mesh(self, model: Any) -> None:
        """Place params on the device mesh when multiple devices exist:
        frozen LM sharded over `model` (megatron-style tp specs), mapper
        replicated, batches later sharded over `data`
        (parallel/mesh.py). No-op on a single device.

        With ``tpu.mesh.pipe > 1`` a 3-D (data, pipe, model) mesh is built
        instead and the LM's stacked layer axis is sharded over `pipe`
        (GPipe pipeline, parallel/pipeline.py); T5-family executors then
        route training/eval losses through the pipelined twin."""
        import jax

        if jax.device_count() <= 1 or not self.config.get("tpu", {}).get(
            "use_mesh", True
        ):
            return
        from ..parallel.mesh import (
            make_mesh,
            replicate_params,
            shard_lm_params,
        )

        sizes = dict(self.config.get("tpu", {}).get("mesh", {}))
        pipe = int(sizes.get("pipe", 1) or 1)
        is_t5 = "lm" in model.params and "shared" in model.params["lm"]
        if pipe > 1 and not is_t5:
            logger.warning(
                "tpu.mesh.pipe=%d requested but the model is not T5-family:"
                " pipeline parallelism is unsupported here, falling back to"
                " the 2-D data x model mesh (pipe devices are reassigned)",
                pipe,
            )
        unsupported = self._pipeline_unsupported_reason() if pipe > 1 \
            else None
        if unsupported is not None:
            logger.warning(
                "tpu.mesh.pipe=%d requested but %s: falling back to the "
                "2-D data x model mesh", pipe, unsupported,
            )
            pipe = 1
        if pipe > 1 and is_t5:
            from ..parallel.pipeline import make_mesh_3d, shard_lm_params_pp

            n = jax.device_count()
            tp = int(sizes.get("model", 1) or 1)
            dp = int(sizes.get("data", -1) or -1)
            if tp in (-1, 0):
                # "model: -1" = all devices not taken by data/pipe
                # (the make_mesh convention, honored here too)
                known_dp = dp if dp > 0 else 1
                tp = max(n // (known_dp * pipe), 1)
            if dp in (-1, 0):
                dp = n // (pipe * tp)
            mesh3d = None
            try:
                mesh3d = make_mesh_3d(n, dp, pipe, tp)
            except ValueError as exc:
                logger.warning(
                    "pipelined mesh disabled (%s); falling back to the "
                    "2-D data x model mesh", exc,
                )
            if mesh3d is not None:
                self.mesh = mesh3d
                self.pipelined = True
                self.n_micro = int(
                    self.config.get("tpu", {}).get("n_micro", 2) or 2
                )
                self.sequence_parallel = bool(
                    self.config.get("tpu", {}).get("sequence_parallel",
                                                   False)
                )
                model.params["lm"] = shard_lm_params_pp(
                    self.mesh, model.params["lm"]
                )
                model.params["mapper"] = replicate_params(
                    self.mesh, model.params["mapper"]
                )
                # route the model's greedy generate paths through the
                # pipelined twins (eval under the 3-D mesh)
                if hasattr(model, "pipeline_ctx"):
                    model.pipeline_ctx = (
                        self.mesh, self.n_micro, self.sequence_parallel
                    )
                logger.info("pipelined mesh active: %s, n_micro=%d",
                            dict(self.mesh.shape), self.n_micro)
                return

        try:
            self.mesh = make_mesh(self.config)
        except ValueError as exc:
            logger.warning("mesh disabled: %s", exc)
            return
        if is_t5:
            model.params["lm"] = shard_lm_params(self.mesh,
                                                 model.params["lm"])
        else:
            model.params["lm"] = replicate_params(self.mesh,
                                                  model.params["lm"])
        model.params["mapper"] = replicate_params(self.mesh,
                                                  model.params["mapper"])
        logger.info("mesh active: %s", dict(self.mesh.shape))

    def _replicate_loaded(self, params: Any) -> Any:
        """Checkpoint-loaded params must join the active mesh: restored
        leaves can arrive as single-device-committed jax arrays, which
        jit refuses to mix with mesh-sharded LM params. Round-trip
        through host memory and replicate (no-op without a mesh)."""
        if self.mesh is None:
            return params
        import jax

        from ..parallel.mesh import replicate_params

        return replicate_params(
            self.mesh, jax.tree.map(np.asarray, params)
        )

    def _maybe_calibrate_int8(self) -> None:
        """Deferred int8 quantization (tpu.int8_calibrate_batches > 0):
        executors that can supply encoder calibration batches override
        this (FewShotVQAExecutor). The base refuses loudly — a model
        left pending would crash later with a confusing missing-ffn_q8
        error inside jit."""
        if getattr(getattr(self, "model", None),
                   "pending_int8_calibration", None):
            raise ValueError(
                "tpu.int8_calibrate_batches is set but "
                f"{type(self).__name__} has no int8 calibration support; "
                "unset it (build-time quantization) or run the eval "
                "through FewShotVQAExecutor"
            )

    def _reshard_lm(self) -> None:
        """Re-place the LM params on the active mesh after they were
        swapped out on host (deferred int8 quantization)."""
        if self.mesh is None:
            return
        if getattr(self, "pipelined", False):
            from ..parallel.pipeline import shard_lm_params_pp

            self.model.params["lm"] = shard_lm_params_pp(
                self.mesh, self.model.params["lm"]
            )
            return
        from ..parallel.mesh import shard_lm_params

        self.model.params["lm"] = shard_lm_params(
            self.mesh, self.model.params["lm"]
        )

    def _pipeline_unsupported_reason(self) -> Optional[str]:
        """Return a human-readable reason when this executor's configured
        modes cannot run under the pipelined (pipe > 1) mesh, or None.
        The base supports pipelining (training loss + greedy generate
        twins exist); eval executors with exotic generate modes override
        this so _setup_mesh can fall back to the 2-D mesh instead of
        leaving GSPMD to improvise on pipe-sharded params."""
        return None

    def _shard(self, array) -> Any:
        """Shard a batch array's leading axis over the mesh data axis —
        or (dcn_data, data) on a hybrid multi-slice mesh (pass-through
        when no mesh).

        On a GLOBAL multi-process mesh the local array is this process's
        [i::P] loader shard of a notional global batch: it becomes the
        process-local portion via ``make_array_from_process_local_data``
        (the multi-controller contract — every process must feed the
        same local batch size each step, which the process-sharded
        loaders guarantee for drop-equal batches)."""
        if self.mesh is None:
            return array
        import jax

        from ..parallel.mesh import (
            batch_sharding,
            data_size,
            spans_processes,
        )

        sharding = batch_sharding(self.mesh)
        if spans_processes(self.mesh):
            import numpy as np

            nprocs = jax.process_count()
            global_rows = array.shape[0] * nprocs
            if global_rows % data_size(self.mesh) != 0:
                raise ValueError(
                    f"multi-process mesh: global batch {global_rows} "
                    f"(local {array.shape[0]} x {nprocs} processes) must "
                    f"divide the mesh's {data_size(self.mesh)} data ways — "
                    "pad or drop the last partial batch"
                )
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(array)
            )
        if array.shape[0] % data_size(self.mesh) != 0:
            # Replicating silently is a throughput cliff (the step runs on
            # every device with the FULL batch) — warn once per run so a
            # persistently misconfigured batch size is loud. Eval generate
            # pads to a divisible size upstream (_dispatch_generative), so
            # this fires only for train/val loss batches or exotic callers.
            if not getattr(self, "_warned_nondivisible_batch", False):
                self._warned_nondivisible_batch = True
                logger.warning(
                    "batch of %d rows does not divide the mesh's %d data "
                    "ways — running REPLICATED (each device computes the "
                    "full batch). Pad the batch or pick a divisible batch "
                    "size to restore data parallelism. (warned once)",
                    array.shape[0], data_size(self.mesh),
                )
            return array  # non-divisible batch: replicate
        return jax.device_put(array, sharding)

    def _pad_rows_to_data_multiple(self, array, group: int = 1):
        """Pad ``array``'s leading axis (``group`` flat rows per logical
        sample) by repeating the final sample so the logical sample count
        divides the mesh's data axis — the eval-side fix for the
        replication cliff above. Returns (padded, n_logical_samples).
        Callers that index results by host-side metadata (e.g.
        ``_collect_generative`` iterating ``batch.question_ids``) ignore
        the extra rows without further bookkeeping."""
        if self.mesh is None:
            return array, array.shape[0] // group
        from ..parallel.mesh import data_size

        d = data_size(self.mesh)
        n = array.shape[0] // group
        if n % d == 0:
            return array, n
        import jax.numpy as jnp

        pad_samples = d - (n % d)
        tail = array[-group:]
        reps = jnp.concatenate([tail] * pad_samples, axis=0)
        return jnp.concatenate([array, reps], axis=0), n

    # ------------------------------------------------------------------
    def setup(self, multi_logger: Optional[MultiLogger] = None) -> None:
        self.multi_logger = multi_logger

    def log_metrics(self, metrics: Dict[str, float],
                    step: Optional[int] = None) -> None:
        if self.multi_logger is not None:
            self.multi_logger.log_metrics(metrics, step or self.global_step)

    @property
    def train_dataloader(self):
        return self.data_loader.train_dataloader

    @property
    def test_dataloader(self):
        return self.data_loader.test_dataloader

    # -- subclass hooks --------------------------------------------------
    def training_step(self, batch: AttrDict, batch_idx: int):
        raise NotImplementedError

    def _generative_step(self, batch: AttrDict, batch_idx: int) -> Dict:
        raise NotImplementedError

    def evaluate_outputs(self, step_outputs: List[Dict],
                         mode: str = "test") -> AttrDict:
        raise NotImplementedError

    def on_train_start(self) -> None:
        pass

    def trainable_state(self) -> Dict[str, Any]:
        """State persisted in checkpoints (mapper params + opt state)."""
        raise NotImplementedError

    def load_trainable_state(self, state: Dict[str, Any]) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def train(self) -> None:
        cfg = self.config
        max_epochs = int(cfg.train.get("epochs", 1))
        step_size = int(cfg.valid.get("step_size", 0) or 0)
        save_interval = int(cfg.train.get("save_interval", 1))
        self.on_train_start()

        # sanity-check validation (PL behavior: 2 batches, errors tolerated)
        self.in_sanity_check = True
        try:
            self.validate(max_batches=2)
        finally:
            self.in_sanity_check = False

        from ..utils.profiling import ThroughputMeter

        meter = ThroughputMeter()
        profile_dir = cfg.get("tpu", {}).get("profile_dir", "")
        profiled = False

        for epoch in range(self.current_epoch, max_epochs):
            self.current_epoch = epoch
            if hasattr(self.train_dataloader, "set_epoch"):
                self.train_dataloader.set_epoch(epoch)
            epoch_t0 = time.perf_counter()
            losses: List[float] = []
            for batch_idx, batch in enumerate(self.train_dataloader):
                if profile_dir and not profiled and self.global_step == 10:
                    # capture a short device trace once training is warm
                    import jax

                    jax.profiler.start_trace(profile_dir)
                meter.start()
                out = self.training_step(batch, batch_idx)
                meter.stop(items=int(cfg.train.batch_size))
                self.global_step += 1
                if profile_dir and not profiled and self.global_step == 13:
                    import jax

                    jax.profiler.stop_trace()
                    profiled = True
                    logger.info("profiler trace written to %s", profile_dir)
                if out is not None and "loss" in out:
                    loss = float(out["loss"])
                    losses.append(loss)
                    if self.global_step % 50 == 0:
                        self.log_metrics({"train/loss": loss})
                if step_size and self.global_step % step_size == 0:
                    self.validate(
                        max_batches=int(
                            cfg.valid.get("break_interval", 0) or 0
                        ) or None
                    )
            epoch_time = time.perf_counter() - epoch_t0
            if losses:
                summary = meter.summary()
                self.log_metrics(
                    {
                        "train/loss_epoch": float(np.mean(losses)),
                        "train/epoch_time_s": epoch_time,
                        "train/examples_per_s": summary.get(
                            "items_per_s", 0.0
                        ),
                        "train/mean_step_s": summary.get("mean_step_s", 0.0),
                    }
                )
            logger.info(
                "epoch %d done in %.1fs (mean loss %s)",
                epoch, epoch_time,
                f"{np.mean(losses):.4f}" if losses else "n/a",
            )

            val_metrics = self.validate()
            if (epoch + 1) % save_interval == 0:
                metric_name = cfg.train.additional.get(
                    "save_top_k_metric", "valid/loss"
                )
                metric_mode = cfg.train.additional.get(
                    "save_top_k_mode", "min"
                )
                state = dict(self.trainable_state())
                state["epoch"] = np.asarray(epoch)
                # multi-controller runs: EVERY process must call the
                # orbax save (it synchronizes internally; the primary
                # host writes the replicated state); the index JSON is
                # host-0-only inside save_checkpoint
                save_checkpoint(
                    cfg.saved_model_path, epoch, state,
                    metric_value=val_metrics.get(metric_name),
                    metric_mode=metric_mode,
                )
            if self.multi_logger is not None:
                self.multi_logger.log_auto_extrema(self.global_step)

    # ------------------------------------------------------------------
    def _eval_loop(self, max_batches: Optional[int] = None) -> List[Dict]:
        """Iterate the test loader through ``_generative_step``, with a
        1-deep dispatch/collect pipeline when the subclass provides
        ``_dispatch_generative`` / ``_collect_generative``: jax's async
        dispatch lets the device run batch N+1's generate while the host
        fetches and detokenizes batch N (a serial loop adds the host
        work straight to device time). Measured NEUTRAL (0.99x) through
        this environment's axon relay, whose execution only starts at
        the fetch (tools/eval_pipeline_bench.py) — retained because on
        standard PJRT runtimes dispatch is genuinely asynchronous, and
        equivalence with the serial loop is pinned by
        tests/test_e2e.py::TestEvalPipelining."""
        self._maybe_calibrate_int8()
        outputs: List[Dict] = []
        dispatch = getattr(self, "_dispatch_generative", None)
        collect = getattr(self, "_collect_generative", None)
        if dispatch is None or collect is None:
            for batch_idx, batch in enumerate(self.test_dataloader):
                if max_batches is not None and batch_idx >= max_batches:
                    break
                outputs.append(self._generative_step(batch, batch_idx))
            return outputs
        pending = None
        for batch_idx, batch in enumerate(self.test_dataloader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            state = dispatch(batch, batch_idx)
            if pending is not None:
                outputs.append(collect(pending))
            pending = state
        if pending is not None:
            outputs.append(collect(pending))
        return outputs

    def validate(self, max_batches: Optional[int] = None) -> Dict[str, float]:
        outputs = self._eval_loop(max_batches)
        if not outputs:
            return {}
        log_dict = self.evaluate_outputs(outputs, mode="test")
        return self.logging_results(log_dict, prefix="valid")

    def test(self) -> Dict[str, float]:
        num_eval = int(self.config.test.get("num_evaluation", 0) or 0)
        outputs = self._eval_loop(num_eval or None)
        log_dict = self.evaluate_outputs(outputs, mode="test")
        return self.logging_results(
            log_dict,
            prefix=self.config.test.get("evaluation_name", "test_evaluation"),
        )

    # ------------------------------------------------------------------
    def logging_results(self, log_dict: AttrDict,
                        prefix: str = "test") -> Dict[str, float]:
        """Prefix metrics, log scalars, emit prediction tables
        (reference: few_shot_vqa_executor.py:370-413)."""
        metrics_to_log: Dict[str, float] = {}
        for metric, value in log_dict.metrics.items():
            metrics_to_log[f"{prefix}/{metric}"] = value
        metrics_to_log[f"{prefix}/epoch"] = self.current_epoch
        logger.info("evaluation results [%s]: %s", prefix, metrics_to_log)
        if self.in_sanity_check:
            logger.warning("sanity check mode: results not logged")
            return metrics_to_log
        self.log_metrics(metrics_to_log)
        table = log_dict.artifacts.get("test_table")
        if table and self.config.get("args", {}).get("log_prediction_tables"):
            if self.multi_logger is not None:
                self.multi_logger.log_table(
                    f"predictions_epoch{self.current_epoch}"
                    f"_MODE({self.config.mode})",
                    table["columns"], table["rows"],
                )
            # always persist a JSON copy (works without wandb)
            out_dir = self.config.get("results_path") or self.config.get(
                "log_path", "."
            )
            try:
                import json
                import os

                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(
                    out_dir,
                    f"prediction_table_epoch{self.current_epoch}.json",
                )
                with open(path, "w", encoding="utf-8") as fh:
                    json.dump(table, fh, default=str)
                logger.info("wrote prediction table to %s", path)
            except Exception as exc:
                logger.warning("could not write prediction table: %s", exc)
        return metrics_to_log

    # ------------------------------------------------------------------
    def maybe_load_checkpoint(self) -> Optional[str]:
        cfg_block = self.config.test if self.config.mode == "test" \
            else self.config.train
        path = get_checkpoint_model_path(
            self.config.saved_model_path,
            load_epoch=int(cfg_block.get("load_epoch", -1)),
            load_best_model=bool(cfg_block.get("load_best_model", 0)),
            load_model_path=cfg_block.get("load_model_path", ""),
        )
        if path is None:
            if self.config.mode == "test":
                raise FileNotFoundError(
                    "test mode requires a checkpoint but none was found "
                    f"under {self.config.saved_model_path}"
                )
            logger.info("no checkpoint found — first time to train")
            return None
        from .checkpointing import load_checkpoint

        state = dict(load_checkpoint(path))
        epoch = state.pop("epoch", None)
        self.load_trainable_state(state)
        if self.config.mode == "train" and epoch is not None:
            # resume from the epoch after the checkpointed one
            self.current_epoch = int(np.asarray(epoch)) + 1
            logger.info("resuming from epoch %d", self.current_epoch)
        logger.info("loaded checkpoint %s", path)
        return path
