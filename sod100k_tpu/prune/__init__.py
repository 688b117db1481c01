"""Channel pruning: gamma thresholding -> slim config -> weight gathers."""

from .finetune import derive_pruned_config, gather_pruned_params, prune

__all__ = ["derive_pruned_config", "gather_pruned_params", "prune"]
