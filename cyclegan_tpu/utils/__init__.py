"""Host-side utilities: metric accumulators, TensorBoard summaries,
checkpoint I/O."""

from cyclegan_tpu.utils.checkpoint import load_pytree, save_pytree
from cyclegan_tpu.utils.metrics import Mean
from cyclegan_tpu.utils.summary import SummaryWriter

__all__ = ["Mean", "SummaryWriter", "save_pytree", "load_pytree"]
