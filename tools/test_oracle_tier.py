#!/usr/bin/env python3
"""Unit test for oracle_check.pick_main_tier / load_costs (VERDICT r15
#5, ADVICE r15, VERDICT r16 #5): the single-slot main tier's
eligibility and ranking rules plus the cost cache's per-lane format and
sql-key provenance, pinned as pure-function cases so a scheduler
regression shows up without a 100x-corpus run.

Run: python3 tools/test_oracle_tier.py   (exit 0 = pass)
Also invoked by the ScalaTest suite (ToolsSpec) so `sbt test` covers it.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import (pick_main_tier, load_costs, pool_equiv,  # noqa: E402
                          sql_key, MAIN_TIER_SEC,
                          MAIN_TIER_FULLTHREAD_SEC)

failures = []


def check(cond, msg):
    if not cond:
        failures.append(msg)
        print(f"FAIL {msg}")
    else:
        print(f"PASS {msg}")


names = ["a", "b", "c", "d", "e"]

# 1. Empty cache (first run on a fresh dump) => empty tier, pure pool.
check(pick_main_tier(names, {}) == [], "empty cost cache => empty tier")

# 2. Pool-lane wall over the pool budget is eligible; the cap is ONE.
costs = {"a": {"pool": 70.0}, "b": {"pool": 90.0}, "c": {"pool": 10.0}}
check(pick_main_tier(names, costs) == ["b"],
      "cap-1: only the heaviest pool-hostile query promotes")

# 3. A MAIN-lane (full-thread) wall uses the ratio-adjusted threshold:
#    dedup_semantic's r15 shape — 25 s at full threads, ~183 s pooled.
costs = {"a": {"main": 25.0}, "b": {"pool": 30.0}}
check(pick_main_tier(names, costs) == ["a"],
      "main-lane 25s (pool-hostile at ~4x) promotes over pool 30s")

# 4. ADVICE r15 (the mis-ranking class): a main-lane 20 s wall
#    (~80 s pool-equivalent) must OUTRANK a pool-lane 70 s wall —
#    raw-wall ranking picked the less pathological straggler.
costs = {"a": {"main": 20.0}, "b": {"pool": 70.0}}
check(pick_main_tier(names, costs) == ["a"],
      "lane-normalized ranking: main 20s beats pool 70s")

# 5. VERDICT r15 #5 (the serial-retry blind spot): a SERIAL-lane wall
#    from a one-off crash retry must not promote a pool-friendly query.
costs = {"a": {"serial": 20.0}}
check(pick_main_tier(names, costs) == [],
      "serial-lane 20s crash-retry wall cannot promote")
costs = {"a": {"serial": 20.0}, "b": {"pool": 70.0}}
check(pick_main_tier(names, costs) == ["b"],
      "serial 20s does not displace pool-hostile 70s")

# 6. A serial wall that would bound the whole run even unpooled
#    (>= the full pool budget at full threads) IS the straggler.
costs = {"a": {"serial": 467.0}, "b": {"pool": 70.0}}
check(pick_main_tier(names, costs) == ["a"],
      "a 467s serial monster still promotes")

# 7. Names outside the run's set never promote (stale cache entries
#    from a renamed/exempted query).
costs = {"zz": {"pool": 500.0}}
check(pick_main_tier(names, costs) == [],
      "stale cache names outside the run's set never promote")

# 8. VERDICT r16 #5 — the measured pair corrects the constant, both
#    ways. Eligibility: a query with BOTH walls whose measured pool
#    wall is under budget must NOT promote, even though its main wall
#    clears the ratio-adjusted bar (the constant would have promoted
#    it; the measurement says the pool handles it).
costs = {"a": {"main": 20.0, "pool": 50.0}, "b": {"pool": 70.0}}
check(pick_main_tier(names, costs) == ["b"],
      "measured pool 50s vetoes the constant's 20s-main promotion")
#    Ranking: both eligible, but a's measured pool wall (65s) ranks
#    BELOW b's 90s — the constant (main 25 x4 = 100) would mis-rank a
#    first and leave the true straggler in the pool.
costs = {"a": {"main": 25.0, "pool": 65.0}, "b": {"pool": 90.0}}
check(pick_main_tier(names, costs) == ["b"],
      "measured pair ranks pool 65 below 90 where the constant said 100")
check(pool_equiv({"main": 25.0, "pool": 65.0}) == 65.0
      and pool_equiv({"main": 25.0}) == 100.0
      and pool_equiv({"serial": 30.0}) == 120.0,
      "pool_equiv: measured pool wins, constants only as fallback")

# 9. load_costs provenance (r17): walls are (corpus, SQL) properties —
#    with the oracle given, only entries whose sql_key matches load;
#    keyless legacy formats are dropped the same way (a stale pool wall
#    beside a fresh main wall would promote a since-fixed query
#    forever). Without the oracle (this harness), keys are unchecked.
import json  # noqa: E402
import tempfile  # noqa: E402
oracle = {"a": "SELECT 1", "b": "SELECT 2", "c": "SELECT 3"}
cache = {
    "a": {"pool": 70.0, "main": 12.0, "k": sql_key(oracle["a"])},
    "b": {"pool": 449.0, "k": "deadbeef00"},   # stale: sql changed
    "c": 33.0,                                  # legacy float: keyless
    "d": [25.0, "main"],                        # r15 format: keyless
    "e": "garbage",
}
with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
    json.dump(cache, fh)
    p = fh.name
lc = load_costs(p, oracle)
check(lc == {"a": {"pool": 70.0, "main": 12.0}},
      "load_costs(oracle): key-valid entries only; stale and keyless drop")
lc2 = load_costs(p)
os.unlink(p)
check(lc2["c"] == {"pool": 33.0} and lc2["d"] == {"main": 25.0}
      and lc2["b"] == {"pool": 449.0} and "e" not in lc2,
      "load_costs(no oracle): legacy formats readable, garbage skipped")
check(load_costs("/nonexistent/_oracle_costs.json") == {},
      "load_costs: missing file is empty")

# 10. Threshold sanity: the constants the rules quote.
check(MAIN_TIER_SEC == 60.0 and MAIN_TIER_FULLTHREAD_SEC == 15.0,
      "tier thresholds unchanged (60s pool / 15s full-thread)")

if failures:
    print(f"== {len(failures)} FAILED ==")
    sys.exit(1)
print("== all tier tests passed ==")
