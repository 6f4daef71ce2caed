#!/usr/bin/env python
"""Reference-scale end-to-end replay benchmark.

Replays the Fitbit medallion pipeline (bronze file streams → watermarked
silver merges → interval joins → gold summary) over TWO incremental
fixture sets generated at the reference corpus volume — >=253,801 bpm
rows per set (BASELINE.md; reference `Ingestion/10-producer.py:76`) —
and asserts every golden count, like the reference's own
`Test Scripts/08-batch-test.py` which budgets 600 s per full run.

Prints ONE JSON line:
  {"metric": "e2e_two_set_replay_wall", "value": N, "unit": "sec", ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark as pl
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
    fitbit_fixtures as fx,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans.fitbit import (
    FitbitPipeline,
)

N_USERS = int(os.environ.get("E2E_USERS", "64"))
CADENCE = int(os.environ.get("E2E_BPM_CADENCE_S", "1"))
REF_BPM_PER_SET = 253_801


def main() -> None:
    spark = pl.get_spark(app_name="pulselake-e2e-bench")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="pulselake_e2e_")
    try:
        pipe = FitbitPipeline(spark, workdir)
        sets, timings = [], {}
        t_all = time.perf_counter()
        for set_id in (1, 2):
            s = fx.generate_set(set_id, n_users=N_USERS, bpm_cadence_s=CADENCE)
            sets.append(s)
            fx.write_landing(s, pipe.landing)
            t0 = time.perf_counter()
            pipe.run()
            timings[f"set{set_id}_run"] = round(time.perf_counter() - t0, 3)
            expected = fx.expected_counts(sets)
            got = pipe.table_counts()
            assert got == expected, f"set {set_id}: {got} != {expected}"
        total = round(time.perf_counter() - t_all, 3)
        bpm_rows = sum(len(s.bpm) for s in sets)
        assert min(len(s.bpm) for s in sets) >= REF_BPM_PER_SET, (
            "fixture volume below reference corpus "
            f"({min(len(s.bpm) for s in sets)} < {REF_BPM_PER_SET})"
        )
        assert total <= 600, f"exceeded reference 600 s budget: {total}"
        print(
            json.dumps(
                {
                    "metric": "e2e_two_set_replay_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "bpm_rows_total": bpm_rows,
                    "bpm_rows_per_set_min": min(len(s.bpm) for s in sets),
                    "reference_bpm_per_set": REF_BPM_PER_SET,
                    "reference_budget_sec": 600,
                    "golden_counts": "pass",
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
