"""Weights & Biases logger (reference deepchem/models/wandblogger.py:12).

Gated on wandb being importable; degrades to a no-op recorder otherwise so
training scripts run identically in zero-egress environments.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

try:
    import wandb as _wandb
    _HAS_WANDB = True
except ImportError:
    _wandb = None
    _HAS_WANDB = False


class WandbLogger:
    """Log training/eval metrics to W&B (reference wandblogger.py:12)."""

    def __init__(self, name: Optional[str] = None,
                 entity: Optional[str] = None,
                 project: Optional[str] = None,
                 mode: str = 'online', id: Optional[str] = None,
                 group: Optional[str] = None, notes: Optional[str] = None,
                 tags: Optional[List[str]] = None,
                 save_run_history: bool = False, **kwargs):
        self.name = name
        self.entity = entity
        self.project = project
        self.mode = mode
        self.id = id
        self.group = group
        self.notes = notes
        self.tags = tags
        self.save_run_history = save_run_history
        self.kwargs = kwargs
        self.initialized = False
        self.run_history: List[Dict[str, Any]] = []
        self.wandb_run = None

    def setup(self) -> None:
        if _HAS_WANDB:
            self.wandb_run = _wandb.init(
                name=self.name, entity=self.entity, project=self.project,
                mode=self.mode, id=self.id, group=self.group,
                notes=self.notes, tags=self.tags, **self.kwargs)
        else:
            logger.warning('wandb not installed; recording locally only')
        self.initialized = True

    def log_data(self, data: Dict[str, Any], step: int) -> None:
        if not self.initialized:
            self.setup()
        record = dict(data)
        record['step'] = step
        self.run_history.append(record)
        if self.wandb_run is not None:
            self.wandb_run.log(data, step=step)

    def log_values(self, values: Dict[str, Any], step: int,
                   group: Optional[str] = None) -> None:
        prefix = f'{group}/' if group else ''
        self.log_data({prefix + k: v for k, v in values.items()}, step)

    def update_config(self, config_data: Dict[str, Any]) -> None:
        """Merge additional configuration into the run (reference
        wandblogger.py:136).  Recorded locally when wandb is absent."""
        self.config = {**getattr(self, 'config', {}), **config_data}
        if self.wandb_run is not None:
            self.wandb_run.config.update(config_data)

    def finish(self) -> None:
        if self.wandb_run is not None:
            self.wandb_run.finish()
        self.initialized = False


class TensorboardLogger:
    """Minimal scalar logger with TensorBoard event output when available
    (reference keras_model.py:1153 / torch_model.py:1140 tensorboard
    hooks)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.history: List = []
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self.history.append((tag, float(value), int(step)))
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
