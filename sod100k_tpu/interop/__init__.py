"""PyTorch interop: checkpoints and pretrained weights <-> param pytrees."""

from .torch_ckpt import (
    load_checkpoint,
    load_pretrained,
    pytree_to_state_dict,
    state_dict_to_pytree,
)

__all__ = ["load_checkpoint", "load_pretrained", "pytree_to_state_dict",
           "state_dict_to_pytree"]
