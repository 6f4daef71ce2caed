"""Dependency-wave stream orchestration (reference T10).

The reference runs its silver pipelines in three waves with barriers —
wave 2 reads wave 1's output tables (``Silver/05-silver.py:481-503``)
— blocking on ``spark.streams.active`` between waves, with a fair-
scheduler pool per layer. This module is that pattern as a reusable
runner: each wave is a list of thunks that start and return a
StreamingQuery; the runner starts a wave, waits for every query in it
to terminate (availableNow drains) or reach a steady state, then
starts the next.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamWave:
    """One barrier group. ``pool`` maps to a fair-scheduler pool the
    way the reference sets ``spark.scheduler.pool`` per layer
    (``Silver/05-silver.py:92,137,...``)."""

    name: str
    starters: Sequence[Callable[[], StreamingQuery]] = field(default_factory=list)
    pool: str | None = None


def run_waves(
    spark: SparkSession, waves: Sequence[StreamWave], timeout_sec: int = 600
) -> dict[str, list[str]]:
    """Run waves with barriers. Returns {wave: [query names]}. Queries
    must use availableNow (drain) triggers — the runner awaits their
    termination before releasing the next wave."""
    report: dict[str, list[str]] = {}
    for wave in waves:
        if wave.pool:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", wave.pool)
        queries = [start() for start in wave.starters]
        for q in queries:
            if not q.awaitTermination(timeout_sec):
                q.stop()
                raise TimeoutError(
                    f"stream {q.name or q.id} in wave {wave.name!r} did not "
                    f"drain within {timeout_sec}s"
                )
            if q.exception() is not None:
                raise q.exception()
        report[wave.name] = [q.name or str(q.id) for q in queries]
        if wave.pool:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
    return report
