from .watermark import RunLog  # noqa: F401
from .runner import PipelineConfig, run_daily  # noqa: F401
