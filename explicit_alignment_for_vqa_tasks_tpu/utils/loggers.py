"""Experiment loggers: TensorBoard + optional Weights & Biases + history.

The reference runs three PL loggers side by side (reference:
src/main.py:85-111): TensorBoardLogger, WandbLogger, and a custom in-memory
history logger. We reproduce that trio without PyTorch-Lightning:
`MultiLogger` fans every scalar out to tensorboardX (if available), wandb
(if installed and enabled in config), and a `MetricsHistory`.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

from .metrics_history import MetricsHistory

logger = logging.getLogger(__name__)


class TensorBoardSink:
    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter  # baked into the image

        os.makedirs(log_dir, exist_ok=True)
        self._writer = SummaryWriter(log_dir)

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        for name, value in metrics.items():
            try:
                self._writer.add_scalar(name, float(value), step)
            except (TypeError, ValueError):
                continue

    def close(self) -> None:
        self._writer.close()


class WandbSink:
    """wandb sink; silently disabled when wandb is not installed."""

    def __init__(self, config: Any):
        self._run = None
        try:
            import wandb  # optional
        except ImportError:
            logger.info("wandb not installed; skipping wandb logging")
            return
        wb_cfg = config.get("WANDB", {})
        self._run = wandb.init(
            project=wb_cfg.get("project") or "explicit-alignment-tpu",
            entity=wb_cfg.get("entity") or None,
            name=config.get("experiment_name", "default"),
            tags=list(wb_cfg.get("tags", [])),
            config=config.to_dict() if hasattr(config, "to_dict") else dict(config),
            resume="allow",
        )

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._run is not None:
            self._run.log(dict(metrics), step=step)

    def log_table(self, name: str, columns: List[str], rows: List[List]) -> None:
        if self._run is None:
            return
        import wandb

        self._run.log({name: wandb.Table(columns=columns, data=rows)})

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()


class MultiLogger:
    """Fans metrics out to TB + wandb + in-memory history."""

    def __init__(self, config: Any, use_wandb: bool = True, use_tb: bool = True):
        self.history = MetricsHistory()
        self._sinks: List[Any] = []
        if use_tb:
            try:
                self._sinks.append(
                    TensorBoardSink(config.get("tensorboard_path", "tb_logs"))
                )
            except Exception as exc:
                logger.warning("tensorboard logging disabled: %s", exc)
        self._wandb: Optional[WandbSink] = None
        if use_wandb:
            self._wandb = WandbSink(config)
            self._sinks.append(self._wandb)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        scalars = {}
        for name, value in metrics.items():
            try:
                scalars[name] = float(value)
            except (TypeError, ValueError):
                continue
        self.history.log_dict(scalars, step)
        for sink in self._sinks:
            sink.log_scalars(scalars, step)

    def log_table(self, name: str, columns: List[str], rows: List[List]) -> None:
        if self._wandb is not None:
            self._wandb.log_table(name, columns, rows)

    def log_auto_extrema(self, step: int) -> Dict[str, float]:
        """Log running max/min of every tracked metric
        (reference behavior: src/trainers/base_executor.py:59-71)."""
        extrema = self.history.auto_extrema()
        for sink in self._sinks:
            sink.log_scalars(extrema, step)
        return extrema

    def close(self) -> None:
        for sink in self._sinks:
            try:
                sink.close()
            except Exception:
                pass
