from .ops import (
    finalize_running_totals,
    run_stream_to_memory,
    stream_table,
    streaming_dedup,
    streaming_interval_join,
)
from .orchestrator import StreamWave, run_waves

__all__ = [
    "finalize_running_totals",
    "run_stream_to_memory",
    "stream_table",
    "streaming_dedup",
    "streaming_interval_join",
    "StreamWave",
    "run_waves",
]
