"""Deterministic Fitbit-workload fixture generator.

Reimplements the *shape* of the reference's test corpus (FIXTURES.md;
reference ``Data Producers/*`` and ``Ingestion/10-producer.py``) as
seeded, dependency-free generators — registered-user CSVs, gym-login
CSVs, and a Kafka-envelope JSON multiplex carrying user_info /
workout / bpm topics — organized in incremental "sets" so the
two-set replay test (reference ``Test Scripts/08-batch-test.py``) can
assert idempotency and incrementality.

Counts are scaled down from the reference corpus (253,801 bpm rows)
but structurally identical: sessions sit inside gym visits, every
(user, session) has exactly one start and one stop within 3 hours,
bpm readings tick at a fixed cadence per session for the user's
device. Golden counts are *computed* from the generated structure,
not hard-coded.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

BASE_EPOCH = 1_672_531_200  # 2023-01-01 00:00:00 UTC
DAY = 86_400
BPM_CADENCE_S = 5  # one reading per 5 s (reference: per second)


@dataclass
class FixtureSet:
    set_id: int
    users: list[dict] = field(default_factory=list)
    gym_logins: list[dict] = field(default_factory=list)
    user_info: list[dict] = field(default_factory=list)
    workouts: list[dict] = field(default_factory=list)
    bpm: list[dict] = field(default_factory=list)


def _mac(i: int) -> str:
    return ":".join(f"{(i * 7 + j * 31) % 256:02x}" for j in range(6))


def generate_set(
    set_id: int,
    n_users: int = 5,
    seed: int = 42,
    bpm_cadence_s: int = BPM_CADENCE_S,
) -> FixtureSet:
    """One incremental fixture set. Users, sessions and device ids are
    disjoint across sets (like the reference's set 1 / set 2 files).

    ``bpm_cadence_s=1`` reproduces the reference's per-second BPM feed;
    with ~63 users that lands ≥253,801 bpm rows per set — the
    reference corpus volume (BASELINE.md)."""
    rng = random.Random(seed + set_id)
    fx = FixtureSet(set_id)
    base_uid = 11_000 + (set_id - 1) * n_users
    workout_id = 1
    for u in range(n_users):
        user_id = base_uid + u
        device_id = 100_000 + user_id
        mac = _mac(user_id)
        reg_ts = BASE_EPOCH + rng.randint(0, 30) * DAY + rng.randint(0, DAY - 1)
        fx.users.append(
            {
                "user_id": user_id,
                "device_id": device_id,
                "mac_address": mac,
                "registration_timestamp": float(reg_ts),
            }
        )
        # CDC: one 'new' profile, some users get an 'update'
        dob_year = rng.randint(1950, 2005)
        profile = {
            "user_id": user_id,
            "update_type": "new",
            "timestamp": float(reg_ts + 60),
            "dob": f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/{dob_year}",
            "sex": rng.choice(["M", "F"]),
            "gender": rng.choice(["M", "F"]),
            "first_name": f"First{user_id}",
            "last_name": f"Last{user_id}",
            "address": {
                "street_address": f"{user_id} Main St",
                "city": rng.choice(["Fullerton", "Irvine", "Anaheim"]),
                "state": "CA",
                "zip": 90_000 + rng.randint(0, 999),
            },
        }
        fx.user_info.append(profile)
        if rng.random() < 0.4:
            upd = dict(profile)
            upd["address"] = dict(profile["address"])
            upd["update_type"] = "update"
            upd["timestamp"] = float(reg_ts + 3_600)
            upd["last_name"] = f"Last{user_id}Updated"
            fx.user_info.append(upd)
        # gym visits: 1-2 per user, sessions inside with 5-min buffers.
        # Visits are strictly non-overlapping in time (each login is drawn
        # after the previous logout): overlapping visits on one device
        # would emit duplicate (device_id, time) bpm keys, which the
        # silver dedup (correctly) collapses — like the reference corpus,
        # the fixture keeps one reading per device-second.
        next_free = reg_ts
        for _v in range(rng.randint(1, 2)):
            login = next_free + rng.randint(1, 20) * DAY + rng.randint(0, DAY // 2)
            n_sessions = rng.randint(1, 2)
            t = login + 300  # 5-min entry buffer
            for _s in range(n_sessions):
                dur = rng.randint(20, 40) * 60  # ≥20-minute session
                start, stop = t, t + dur
                fx.workouts.append(
                    {
                        "user_id": user_id,
                        "workout_id": workout_id,
                        "timestamp": float(start),
                        "action": "start",
                        "session_id": workout_id,
                    }
                )
                fx.workouts.append(
                    {
                        "user_id": user_id,
                        "workout_id": workout_id,
                        "timestamp": float(stop),
                        "action": "stop",
                        "session_id": workout_id,
                    }
                )
                for ts in range(start + bpm_cadence_s, stop + 1, bpm_cadence_s):
                    hr = 75 + 10 * ((ts % 60) / 60) + rng.uniform(-20, 20)
                    if rng.random() < 0.002:
                        hr = 0.0  # invalid reading the silver layer must flag
                    fx.bpm.append(
                        {
                            "device_id": device_id,
                            "time": float(ts),
                            "heartrate": round(hr, 1),
                        }
                    )
                workout_id += 1
                t = stop + rng.randint(4, 7) * 60  # 4-7 min gap
            logout = t + 300  # 5-min exit buffer
            next_free = logout
            fx.gym_logins.append(
                {
                    "mac_address": mac,
                    "gym": rng.randint(1, 10),
                    "login": float(login),
                    "logout": float(logout),
                }
            )
    return fx


def write_landing(fx: FixtureSet, landing_dir: str) -> dict[str, int]:
    """Materialize a fixture set into the landing zone the bronze layer
    watches: CSVs for the two file feeds, one Kafka-envelope JSON file
    for the multiplex (reference landing layout,
    ``Ingestion/10-producer.py:14-58``). Returns per-feed row counts."""
    ru_dir = os.path.join(landing_dir, "registered_users")
    gl_dir = os.path.join(landing_dir, "gym_logins")
    kf_dir = os.path.join(landing_dir, "kafka_multiplex")
    for d in (ru_dir, gl_dir, kf_dir):
        os.makedirs(d, exist_ok=True)

    with open(os.path.join(ru_dir, f"{fx.set_id}.csv"), "w") as f:
        f.write("user_id,device_id,mac_address,registration_timestamp\n")
        for r in fx.users:
            f.write(
                f"{r['user_id']},{r['device_id']},{r['mac_address']},"
                f"{r['registration_timestamp']}\n"
            )

    with open(os.path.join(gl_dir, f"{fx.set_id}.csv"), "w") as f:
        f.write("mac_address,gym,login,logout\n")
        for r in fx.gym_logins:
            f.write(f"{r['mac_address']},{r['gym']},{r['login']},{r['logout']}\n")

    offset = fx.set_id * 1_000_000
    with open(os.path.join(kf_dir, f"{fx.set_id}.json"), "w") as f:
        for topic, rows, key_field in (
            ("user_info", fx.user_info, "user_id"),
            ("workout", fx.workouts, "user_id"),
            ("bpm", fx.bpm, "device_id"),
        ):
            for i, payload in enumerate(rows):
                ts_s = payload.get("timestamp") or payload.get("time")
                env = {
                    "key": str(payload[key_field]),
                    "value": json.dumps(payload),
                    "topic": topic,
                    "partition": 0,
                    "offset": offset + i,
                    "timestamp": int(float(ts_s) * 1000),
                }
                f.write(json.dumps(env) + "\n")

    return {
        "registered_users": len(fx.users),
        "gym_logins": len(fx.gym_logins),
        "user_info": len(fx.user_info),
        "workout": len(fx.workouts),
        "bpm": len(fx.bpm),
    }


def expected_counts(sets: list[FixtureSet]) -> dict[str, int]:
    """Golden counts after replaying ``sets`` — the two-set replay
    assertions (reference ``Silver/05-silver.py:512-524``), computed
    from the generated structure."""
    users = sum(len(s.users) for s in sets)
    gym_logs = sum(len(s.gym_logins) for s in sets)
    profiles = users  # one surviving SCD-1 row per user
    workouts = sum(len(s.workouts) for s in sets)
    completed = workouts // 2  # every session has exactly one start+stop
    # heart_rate dedups on (device_id, time) (W1, reference
    # Silver/05-silver.py:272-273): model the surviving set explicitly,
    # keeping the first occurrence per key, rather than assuming raw row
    # counts survive — overlapping sessions on one device would collide.
    surviving: dict[tuple[int, float], dict] = {}
    for s in sets:
        for b in s.bpm:
            surviving.setdefault((b["device_id"], b["time"]), b)
    bpm = len(surviving)
    # workout_bpm: valid *deduped* readings strictly inside (start, stop]
    workout_bpm = 0
    for s in sets:
        starts = {
            (w["user_id"], w["workout_id"]): w["timestamp"]
            for w in s.workouts
            if w["action"] == "start"
        }
        stops = {
            (w["user_id"], w["workout_id"]): w["timestamp"]
            for w in s.workouts
            if w["action"] == "stop"
        }
        by_user = {u["user_id"]: u["device_id"] for u in s.users}
        bpm_by_dev: dict[int, list[dict]] = {}
        for b in surviving.values():
            bpm_by_dev.setdefault(b["device_id"], []).append(b)
        for (uid, wid), t0 in starts.items():
            t1 = stops[(uid, wid)]
            for b in bpm_by_dev.get(by_user[uid], []):
                if t0 < b["time"] <= t1 and b["heartrate"] > 0:
                    workout_bpm += 1
    return {
        "users": users,
        "gym_logs": gym_logs,
        "user_profile": profiles,
        "workouts": workouts,
        "heart_rate": bpm,
        "user_bins": users,
        "completed_workouts": completed,
        "workout_bpm": workout_bpm,
        "workout_bpm_summary": completed,
    }
