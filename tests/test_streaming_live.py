"""Live-trigger streaming E2E — the reference's stream test
(``Test Scripts/09-stream-test.py:64-93``): bronze + silver wave 1 run
with ``processingTime`` triggers (NOT availableNow) while a producer
thread lands fixture set 2 mid-flight; the pipeline must converge to
the golden counts and shut down cleanly.

This exercises the non-drain branch of the dual-mode trigger
(``FitbitPipeline._trigger`` / reference ``Bronze/04-bronze.py:39-42``)
that every other test leaves cold.
"""

from __future__ import annotations

import threading
import time

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
    fitbit_fixtures as fx,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans.fitbit import (
    FitbitPipeline,
)

LIVE_TABLES = ["users", "gym_logs", "user_profile", "workouts", "heart_rate"]


def test_live_processing_time_convergence(spark, tmp_path):
    workdir = str(tmp_path)

    # set 1 via the batch path: establishes bronze schemas, silver
    # tables, and checkpoints the live queries resume from
    batch_pipe = FitbitPipeline(spark, workdir)
    set1 = fx.generate_set(1)
    fx.write_landing(set1, batch_pipe.landing)
    batch_pipe.run()

    live = FitbitPipeline(
        spark, workdir, available_now=False, processing_time="1 seconds"
    )
    queries = [s() for s in live.bronze_starters()]
    queries += [s() for s in live.silver_wave1_starters()]

    set2 = fx.generate_set(2)

    def produce_late():
        time.sleep(3)  # queries are live before files land
        fx.write_landing(set2, live.landing)

    producer = threading.Thread(target=produce_late)
    producer.start()

    expected = fx.expected_counts([set1, set2])
    want = {k: expected[k] for k in LIVE_TABLES}
    deadline = time.time() + 180
    got: dict[str, int] = {}
    def poll_counts() -> dict[str, int] | None:
        # a reader can still lose the version-retention race if it
        # falls >keep_versions merges behind; retry like a Delta
        # reader would after VACUUM
        try:
            return {n: live.store.read(n).count() for n in LIVE_TABLES}
        except Exception:
            return None

    try:
        while time.time() < deadline:
            got = poll_counts() or got
            if got == want:
                break
            time.sleep(2)
        assert got == want, f"never converged: {got} != {want}"
        # prove this really ran as repeated micro-batches, not one drain
        assert any(len(q.recentProgress) > 1 for q in queries)
    finally:
        producer.join()
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination(30)
    # clean shutdown: no query died with an exception
    for q in queries:
        assert q.exception() is None

    # counts hold after shutdown (no half-applied merge)
    final = {n: live.store.read(n).count() for n in LIVE_TABLES}
    assert final == want
