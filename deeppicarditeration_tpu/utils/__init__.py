from deeppicarditeration_tpu.utils.static_fn import StaticFn
from deeppicarditeration_tpu.utils.profiling import step_timer

__all__ = ["StaticFn", "step_timer"]
