from krylov_tpu.diagnostics.report import build_info, finish_banner, start_banner
from krylov_tpu.diagnostics import profiling

__all__ = ["build_info", "finish_banner", "start_banner", "profiling"]
