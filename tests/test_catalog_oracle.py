"""Mirror of the driver's correctness gate: run every catalog query on
Spark and its oracle on DuckDB over the same parquet, compare row
counts and (order-insensitively) values.

This is the test that must stay green — it is exactly what
CORRECTNESS_r{N}.json measures.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
    QUERIES,
)

import os

SF_DIR = os.environ.get("PULSELAKE_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture()
def duck():
    # function-scoped on purpose: one shared connection serving all
    # ~166 oracle queries accumulates allocator state alongside the
    # Spark JVM and intermittently dies mid-suite with a spurious
    # 16 KB "Out of Memory" (seen round 8 at test ~75); a fresh
    # connection per test is milliseconds (views over parquet are
    # metadata) and bounds DuckDB's footprint to one query
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.cache import (
        release_pinned,
    )

    q = QUERIES[name]
    sdf = q.spark(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    release_pinned()  # one session runs ~130 queries — don't accumulate
    if q.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_cols, s_rows = _norm_rows(spark_cols, [tuple(r) for r in spark_rows])
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"{mismatches[0]}"
    )


def test_no_oracle_emits_hugeint_or_decimal(duck):
    """DuckDB's sum(BIGINT) widens to HUGEINT (int128). The driver's
    correctness gate hashes TYPED values (Arrow fetch: HUGEINT becomes
    decimal128, serialized differently from Spark's int64), so an
    uncast sum column fails the driver even though plain-Python
    fetchall() compares equal — exactly the r14 signature on
    seasonal_decompose_events / chisq_event_dow /
    cusum_changepoint_daily (rows+schema match, hash doesn't). Every
    oracle output column must land on a type Spark can emit natively."""
    allowed = {
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "DOUBLE", "FLOAT", "VARCHAR", "DATE", "TIMESTAMP",
        "BOOLEAN", "BLOB",
    }
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        cols = duck.execute(f"DESCRIBE {q.oracle}").fetchall()
        bad = [(c[0], c[1]) for c in cols if c[1] not in allowed]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle columns with engine-unportable types: {offenders}"
    )


def test_every_oracle_parses_in_duckdb(duck):
    """Spark-free regression net: every oracle must EXPLAIN cleanly
    (catches SQL syntax/identifier drift without paying a Spark run)."""
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        try:
            duck.execute(f"EXPLAIN {q.oracle}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name}: oracle does not plan: {e}") from e


def test_readme_counts_are_generated():
    """README's query counts and provenance table must match the
    registry + committed CORRECTNESS artifacts — regenerating must be a
    no-op. On failure run `python tools/gen_docs.py` (round-3 verdict,
    'What's wrong' #4: hand-maintained counts drift)."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "gen_docs", root / "tools" / "gen_docs.py"
    )
    gen_docs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_docs)
    readme = (root / "README.md").read_text()
    assert gen_docs.regenerate(readme) == readme, (
        "README.md is stale — run `python tools/gen_docs.py`"
    )


def test_driver_priority_orders_never_green_then_changed_then_stalest():
    """The generated enumeration puts never-green queries first, then
    code-changed-since-green, then ascending last-green round, and
    QUERIES iterates in that order (what __spark_entry__.queries()
    exposes to the driver)."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        changed_since_green,
        driver_priority,
        last_green_rounds,
        module_churn_since_green,
    )

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        _AGE_BACKSTOP,
        _CANONICAL_ORDER,
        _DRIVER_BUDGET,
        _STALE_QUOTA,
    )

    green = last_green_rounds()
    changed = changed_since_green(green)
    churn = module_churn_since_green(green, changed)
    next_round = max(green.values(), default=0) + 1
    order = driver_priority()
    assert order == list(QUERIES), "QUERIES dict order must match priority"
    # idempotence: the priority keys on the canonical registration
    # order, never the reordered live dict, so recomputing it after the
    # in-place reorder yields the same enumeration
    assert driver_priority() == order

    def cls(n):
        g = green.get(n, 0)
        if g == 0:
            return 0
        if changed.get(n) == "def":
            return 1
        if next_round - g >= _AGE_BACKSTOP:
            return 2
        return 3 if n in changed else 4

    insertion = {n: i for i, n in enumerate(_CANONICAL_ORDER)}

    def key(n):
        c = -churn.get(n, 0) if cls(n) == 3 else 0
        return (cls(n), c, green.get(n, 0), insertion[n])

    plain = sorted(_CANONICAL_ORDER, key=key)
    pool = [n for n in plain if cls(n) in (2, 4)]
    stalest = pool[:_STALE_QUOTA]
    if stalest:
        reserved = set(stalest)
        non_res = [n for n in plain if n not in reserved]
        cut = max(0, _DRIVER_BUDGET - len(stalest))
        window = sorted(non_res[:cut] + stalest, key=key)
        in_window = set(window)
        plain = window + [n for n in plain if n not in in_window]
    assert order == plain, (
        "not (class, churn, last-green)-sorted modulo the stale quota"
    )
    # the round-12 ask #1 done-bar: every row whose green evidence
    # would be >= _AGE_BACKSTOP rounds old next round sits INSIDE the
    # driver window (guaranteed whenever the aged set fits the quota —
    # true at HEAD and by construction in steady state, since each
    # round retires every seated aged row)
    aged = [n for n in _CANONICAL_ORDER if cls(n) == 2]
    if len(aged) <= _STALE_QUOTA:
        window50 = set(order[:_DRIVER_BUDGET])
        missing = [n for n in aged if n not in window50]
        assert not missing, (
            f"aged rows stranded outside the driver window: {missing}"
        )


def test_driver_priority_bumps_changed_module_query():
    """Round-4 verdict 'Next round' #3: a query whose implementing
    module changed since its last green round must outrank a merely
    OLDER untouched row — a rewrite can never coast on a stale green."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        driver_priority,
    )

    names = list(QUERIES)
    older_untouched, newer_changed = names[0], names[1]
    green = {n: 4 for n in names}
    green[older_untouched] = 2  # stalest, but code untouched
    green[newer_changed] = 3  # fresher row — yet its module changed
    order = driver_priority(green=green, changed={newer_changed})
    assert order.index(newer_changed) < order.index(older_untouched)
    # and within the changed class, stalest-first still holds
    third = names[2]
    green[third] = 2
    order2 = driver_priority(green=green, changed={newer_changed, third})
    assert order2.index(third) < order2.index(newer_changed)
    # round-11 ask #1: a BIGGER module diff since the green commit
    # outranks mere staleness within the mods class — the most-churned
    # module's rows get the freshest driver evidence
    order3 = driver_priority(
        green=green,
        changed={newer_changed, third},
        churn={newer_changed: 800, third: 12},
    )
    assert order3.index(newer_changed) < order3.index(third)


def test_driver_priority_reserves_slots_for_stalest_untouched_rows():
    """Round-6 verdict ask #2: even when never-green + changed rows
    alone would fill the driver's 50-row budget, the stalest
    untouched-green rows keep a guaranteed quota inside the window —
    rotation can no longer starve them indefinitely."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        _CANONICAL_ORDER,
        _DRIVER_BUDGET,
        _STALE_QUOTA,
        driver_priority,
    )

    names = list(_CANONICAL_ORDER)
    assert len(names) > _DRIVER_BUDGET + _STALE_QUOTA
    # 60 never-green rows: enough churn to flood the whole budget
    green = {n: 0 for n in names[:60]}
    for i, n in enumerate(names[60:]):
        green[n] = 2 + (i % 4)  # untouched-green, rounds 2..5
    order = driver_priority(green=green, changed=set())
    window = set(order[:_DRIVER_BUDGET])
    stalest = sorted(
        (n for n in names[60:]),
        key=lambda n: (green[n], names.index(n)),
    )
    promoted = [n for n in stalest[:_STALE_QUOTA] if n in window]
    assert len(promoted) == _STALE_QUOTA, (
        f"only {len(promoted)} of the {_STALE_QUOTA} stalest untouched "
        "rows made the driver window"
    )
    # and promotion took the rows in staleness order: no promoted row
    # is younger (greener) than any stale row left outside the window
    # (a fixed `green == 2` check breaks as the catalog grows — once
    # names[60:] exceeds 4x the quota, the stalest prefix necessarily
    # spans several green rounds of the synthetic 4-round cycle)
    displaced = [n for n in stalest[_STALE_QUOTA:] if n not in window]
    # when nothing is displaced (every stale row fits the window) the
    # ordering property is vacuously satisfied
    assert not displaced or max(green[n] for n in promoted) <= min(
        green[n] for n in displaced
    )

    # The partially-seated case (caught live in round 8): when classes
    # 0-1 leave SOME natural class-2 seats — fewer than the quota —
    # the reservation must top the window up to the full quota of
    # stalest rows, displacing class-1 overflow, never other stalest
    # class-2 rows (the r7 tail-insertion bug net-gained zero seats).
    n_c1 = _DRIVER_BUDGET - _STALE_QUOTA + 6  # leaves quota-6 natural
    # greens span 3..6 so no row crosses the _AGE_BACKSTOP (5 rounds
    # behind next_round=7) — this test pins the quota mechanics alone;
    # the aged-class interplay is pinned in
    # test_driver_priority_age_backstop_*
    green2 = {n: 6 for n in names[:n_c1]}
    for i, n in enumerate(names[n_c1:]):
        green2[n] = 3 + (i % 4)
    order2 = driver_priority(
        green=green2, changed=set(names[:n_c1])
    )
    window2 = set(order2[:_DRIVER_BUDGET])
    stalest2 = sorted(
        (n for n in names[n_c1:]),
        key=lambda n: (green2[n], names.index(n)),
    )[:_STALE_QUOTA]
    assert all(n in window2 for n in stalest2), (
        "partially-seated quota lost stalest rows to the promotion"
    )
    assert sum(1 for n in window2 if green2[n] == 6) == (
        _DRIVER_BUDGET - _STALE_QUOTA
    ), "displacement must come from class-1 overflow only"


def test_driver_priority_age_backstop_promotes_stale_mods_rows():
    """Round-12 verdict ask #1: the churn ranking stranded 18 r7-green
    ANN + core-streaming rows at window positions 50-66 for a second
    consecutive round. Any green row >= _AGE_BACKSTOP rounds behind
    the upcoming round must outrank the whole churn-ranked mods class,
    AND survive a class-0 flood via the reservation pool."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        _AGE_BACKSTOP,
        _DRIVER_BUDGET,
        driver_priority,
    )

    names = list(QUERIES)
    aged_mods, fresh_mods = names[0], names[1]
    green = {n: 11 for n in names}
    green[aged_mods] = 12 - _AGE_BACKSTOP  # next_round=13 -> age 6
    green[fresh_mods] = 11
    # enormous churn on the fresh row, none on the aged one: without
    # the backstop, churn ranks the fresh row first (the r12 failure)
    order = driver_priority(
        green=green,
        changed={aged_mods: "mods", fresh_mods: "mods"},
        churn={fresh_mods: 100_000},
    )
    assert order.index(aged_mods) < order.index(fresh_mods), (
        "aged row must outrank the mods class regardless of churn"
    )
    # class-0 flood: 60 never-green rows would fill the budget, but
    # the reservation pool leads with aged rows — the aged row keeps
    # a seat inside the window
    green2 = dict(green)
    for n in names[2:62]:
        green2[n] = 0
    order2 = driver_priority(
        green=green2,
        changed={aged_mods: "mods", fresh_mods: "mods"},
        churn={fresh_mods: 100_000},
    )
    assert order2.index(aged_mods) < _DRIVER_BUDGET, (
        "aged row squeezed out of the window by a class-0 flood"
    )
    # an aged UNTOUCHED row is equally protected (class is assigned
    # before the changed-set check)
    green3 = dict(green2)
    aged_untouched = names[62]
    green3[aged_untouched] = 12 - _AGE_BACKSTOP
    order3 = driver_priority(
        green=green3, changed={fresh_mods: "mods"}, churn={}
    )
    assert order3.index(aged_untouched) < _DRIVER_BUDGET


def test_rows_only_queries_are_documented_exceptions():
    """Every oracle-less query must be a genuinely non-SQL-expressible
    op (streaming-stateful or engine-specific estimate) — the driver
    records a weaker check for these, so keep the list tight."""
    allowed: set[str] = set()  # r4: approx_distinct_agg gained a within_rsd oracle
    actual = {n for n, q in QUERIES.items() if q.oracle is None}
    assert actual <= allowed, f"unexpected rows-only queries: {actual - allowed}"


def test_readme_guard_survives_newer_artifact(tmp_path):
    """Round-4 verdict 'Next round' #1 acceptance: the freshness guard
    must stay green on a checkout where the driver wrote a NEWER
    CORRECTNESS artifact after the last README regeneration — the
    stamped artifact set, not the directory listing, defines coverage."""
    import importlib.util
    import json
    import shutil
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "gen_docs2", root / "tools" / "gen_docs.py"
    )
    gen_docs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_docs)
    readme = (root / "README.md").read_text()
    # simulate: a brand-new artifact lands next to the committed ones
    for p in root.glob("CORRECTNESS_r*.json"):
        shutil.copy(p, tmp_path / p.name)
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({"pricing_summary": {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}})
    )
    gen_docs.ROOT = tmp_path  # _all_artifacts now sees r99 too
    # the guard's call shape (no explicit artifacts) → stamped set only
    assert gen_docs.regenerate(readme) == readme
    # explicit regeneration DOES pick up the new artifact
    regenerated = gen_docs.regenerate(
        readme, artifacts=gen_docs._all_artifacts(tmp_path)
    )
    assert "CORRECTNESS_r99.json" in regenerated
    assert regenerated != readme
