"""Shared utilities (L5): schedules, batch limiting, statistics, monitoring, wandb."""

from . import monitoring, scheduling, statistics, wandb  # noqa: F401
