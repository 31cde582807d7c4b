"""Rewrite README.md's anchored performance numbers from BENCH_DETAILS.json.

Every README performance number carries ``<!--bench:KEY*MULT-->`` naming
its artifact row (tests/test_readme_numbers.py enforces agreement).  After
a bench re-run this script re-derives each displayed value at the same
decimal precision the README already uses, so a regen is one command
instead of a hand-edit:

    python tools/refresh_readme.py          # rewrite in place
    python tools/refresh_readme.py --check  # print would-be changes only
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(ROOT, "README.md")
ARTIFACT = os.path.join(ROOT, "BENCH_DETAILS.json")

# same shape as tests/test_readme_numbers.py's anchor regex, but keeping
# the unit/bold suffix so the rewrite is purely the numeric token
_ANCHOR = re.compile(
    r"([\d][\d,]*(?:\.\d+)?)(\s*(?:ms|s|×|x|GiB|%|k)?\s*(?:\*\*)?"
    r"<!--bench:([A-Za-z0-9_.]+)\*([0-9eE.+-]+)-->)"
)


def _format_like(old: str, value: float) -> str:
    decimals = len(old.split(".")[1]) if "." in old else 0
    out = f"{value:,.{decimals}f}" if "," in old else f"{value:.{decimals}f}"
    return out


def main():
    check = "--check" in sys.argv
    with open(ARTIFACT) as f:
        details = json.load(f)
    with open(README) as f:
        readme = f.read()

    changed = []

    def sub(m):
        old_num, suffix, key, mult = m.groups()
        if key not in details:
            changed.append(f"MISSING artifact row: {key}")
            return m.group(0)
        derived = float(details[key]) * float(mult)
        new_num = _format_like(old_num, derived)
        if new_num != old_num:
            changed.append(f"{key}: {old_num} -> {new_num}")
        return new_num + suffix

    out = _ANCHOR.sub(sub, readme)
    for line in changed:
        print(line)
    if not changed:
        print("README already matches the artifact.")
    if not check and out != readme:
        with open(README, "w") as f:
            f.write(out)
        print(f"rewrote {len([c for c in changed if '->' in c])} numbers")


if __name__ == "__main__":
    main()
