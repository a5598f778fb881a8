#!/usr/bin/env python3
"""Unit test for oracle_check.pick_main_tier (VERDICT r15 #5 + ADVICE
r15): the single-slot main tier's eligibility and ranking rules, pinned
as pure-function cases so a scheduler regression shows up without a
100x-corpus run.

Run: python3 tools/test_oracle_tier.py   (exit 0 = pass)
Also invoked by the ScalaTest suite (ToolsSpec) so `sbt test` covers it.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import (pick_main_tier, load_costs,  # noqa: E402
                          MAIN_TIER_SEC, MAIN_TIER_FULLTHREAD_SEC)

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
costs = {"a": (70.0, "pool"), "b": (90.0, "pool"), "c": (10.0, "pool")}
check(pick_main_tier(names, costs) == ["b"],
      "cap-1: only the heaviest pool-hostile query promotes")

# 3. A MAIN-lane (full-thread) wall uses the ratio-adjusted threshold:
#    dedup_semantic's shape — 25 s at full threads, ~183 s pooled.
costs = {"a": (25.0, "main"), "b": (30.0, "pool")}
check(pick_main_tier(names, costs) == ["a"],
      "main-lane 25s (pool-hostile at ~4x) promotes over pool 30s")

# 4. ADVICE r15 (the mis-ranking class): a main-lane 20 s wall
#    (~80 s pool-equivalent) must OUTRANK a pool-lane 70 s wall —
#    raw-wall ranking picked the less pathological straggler.
costs = {"a": (20.0, "main"), "b": (70.0, "pool")}
check(pick_main_tier(names, costs) == ["a"],
      "lane-normalized ranking: main 20s beats pool 70s")

# 5. VERDICT r15 #5 (the serial-retry blind spot): a SERIAL-lane wall
#    from a one-off crash retry must not promote a pool-friendly query.
#    20 s at full threads is far under the pool budget even at the
#    thread ratio's worst case measured for friendly queries.
costs = {"a": (20.0, "serial")}
check(pick_main_tier(names, costs) == [],
      "serial-lane 20s crash-retry wall cannot promote")
# ... and it can't displace a genuinely pool-hostile query either
costs = {"a": (20.0, "serial"), "b": (70.0, "pool")}
check(pick_main_tier(names, costs) == ["b"],
      "serial 20s does not displace pool-hostile 70s")

# 6. A serial wall that would bound the whole run even unpooled
#    (>= the full pool budget at full threads) IS the straggler —
#    dedup_semantic at 100x: 467 s serial.
costs = {"a": (467.0, "serial"), "b": (70.0, "pool")}
check(pick_main_tier(names, costs) == ["a"],
      "a 467s serial monster still promotes")

# 7. Names outside the run's set never promote (stale cache entries
#    from a renamed/exempted query).
costs = {"zz": (500.0, "pool")}
check(pick_main_tier(names, costs) == [],
      "stale cache names outside the run's set never promote")

# 8. load_costs: legacy lane-less entries read as pool walls; garbage
#    entries are skipped, a missing file is empty.
import json  # noqa: E402
import tempfile  # noqa: E402
with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
    json.dump({"a": 70.0, "b": [25.0, "main"], "c": "garbage"}, fh)
    p = fh.name
lc = load_costs(p)
os.unlink(p)
check(lc == {"a": (70.0, "pool"), "b": (25.0, "main")},
      "load_costs: legacy floats are pool-lane, garbage skipped")
check(load_costs("/nonexistent/_oracle_costs.json") == {},
      "load_costs: missing file is empty")

# 9. Threshold sanity: the constants the rules quote.
check(MAIN_TIER_SEC == 60.0 and MAIN_TIER_FULLTHREAD_SEC == 15.0,
      "tier thresholds unchanged (60s pool / 15s full-thread)")

if failures:
    print(f"== {len(failures)} FAILED ==")
    sys.exit(1)
print("== all tier tests passed ==")
