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


def main() -> int:
    args = set(sys.argv[1:])
    do_pytest = not args or "--pytest" in args
    do_oracle = not args or "--oracle" in args
    ok = True
    if do_pytest:
        ok = run_pytest() and ok
    if do_oracle:
        ok = run_oracle() and ok
    print(f"== gate: {'GREEN' if ok else 'RED — do not snapshot'} ==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
