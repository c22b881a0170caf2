"""The pre-snapshot gate: pytest + the full DuckDB oracle sweep.

Round 4 shipped with a red test and 20 erring driver queries because
the gate was a convention, not a command. This makes it mechanical:

    python tools/gate.py            # full gate (pytest + oracle @ sf0.01)
    python tools/gate.py --oracle   # oracle sweep only
    python tools/gate.py --pytest   # test suite only

Exit code 0 iff EVERYTHING is green. Run it before every end-of-round
commit; if it is red, the snapshot is not ready.
"""

import subprocess
import sys

REPO = "/root/repo"


def run_pytest() -> bool:
    print("== gate: pytest ==", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=REPO,
    )
    return r.returncode == 0


def run_oracle() -> bool:
    print("== gate: oracle sweep (sf0.01) ==", flush=True)
    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        cwd=REPO,
    )
    return r.returncode == 0


def run_registry() -> bool:
    """Mechanical registry invariants: queries() and oracle_sql() carry
    identical key sets, and every query WITHOUT a prior driver
    correctness row sits inside the first 50 entries (the driver's
    observed sweep cap — see the queries() docstring)."""
    print("== gate: registry invariants ==", flush=True)
    import glob
    import json

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    qs = list(E.queries())
    os_ = set(E.oracle_sql())
    ok = True
    if set(qs) != os_:
        print(f"KEY DRIFT: {set(qs) ^ os_}")
        ok = False
    gated = set()
    for f in glob.glob(f"{REPO}/CORRECTNESS_r*.json"):
        gated |= set(json.load(open(f)))
    stranded = [q for q in qs[50:] if q not in gated]
    if stranded:
        print(f"NEVER-DRIVER-GATED queries outside head-50: {stranded}")
        ok = False
    print("registry:", "ok" if ok else "RED", f"({len(qs)} queries)")
    return ok


def main() -> int:
    args = set(sys.argv[1:])
    do_pytest = not args or "--pytest" in args
    do_oracle = not args or "--oracle" in args
    ok = run_registry()
    if do_pytest:
        ok = run_pytest() and ok
    if do_oracle:
        ok = run_oracle() and ok
    print(f"== gate: {'GREEN' if ok else 'RED — do not snapshot'} ==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
