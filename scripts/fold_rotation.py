"""Fold a driver CORRECTNESS artifact into the registry's rotation
audit — the mechanical half of each round's registry update.

    python scripts/fold_rotation.py <round> [--write]

Reads CORRECTNESS_r{round:02d}.json, sets every swept name's
_LAST_SWEPT entry to <round> (names being retired must be deleted from
the dict by hand FIRST — this tool refuses to invent or drop rows),
and regenerates the dict block in plans/registry.py.  Without
--write it prints the new block to stdout for review.

The judgment half stays manual on purpose: choosing _ROUND /
_NEW_THIS_ROUND / _CHANGED_SINCE_ROW and executing consolidations are
decisions, not bookkeeping — the registry's asserts then prove the
arithmetic (window fit, 3W−2 ceiling) at import.
"""

from __future__ import annotations

import json
import re
import sys

REG = "market_insights_app_spark/plans/registry.py"


def format_block(swept: dict[str, int]) -> str:
    pairs = [f'"{k}": {v},' for k, v in sorted(swept.items())]
    lines, cur = [], "   "
    for p in pairs:
        if len(cur) + 1 + len(p) > 79:
            lines.append(cur)
            cur = "    " + p
        else:
            cur += " " + p
    lines.append(cur)
    return "\n".join(lines)


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    write = "--write" in sys.argv

    src = open(REG).read()
    m = re.search(
        r"(_LAST_SWEPT: dict\[str, int\] = \{\n)(.*?)(\n\})", src, re.S
    )
    if not m:
        sys.exit("could not locate the _LAST_SWEPT block")
    swept = {
        k: int(v) for k, v in re.findall(r'"(\w+)": (\d+)', m.group(2))
    }
    art = f"CORRECTNESS_r{rnd:02d}.json"
    rows = json.load(open(art))
    missing = sorted(set(rows) - set(swept))
    if missing:
        sys.exit(
            f"{art} contains names absent from _LAST_SWEPT (retired or "
            f"new-this-round — reconcile by hand first): {missing}"
        )
    def is_red(r) -> bool:
        if not isinstance(r, dict):
            return True
        if r.get("err") == "no_oracle":  # rows-only rows count as swept
            return False
        return bool(r.get("err")) or not (
            r.get("rows_match") and r.get("schema_match")
        )

    red = sorted(n for n, r in rows.items() if is_red(r))
    if red:
        sys.exit(f"refusing to fold non-green rows: {red}")
    for n in rows:
        swept[n] = rnd
    block = format_block(swept)
    if not write:
        print(block)
        print(
            f"\n# {len(rows)} names -> {rnd}; {len(swept)} total. "
            "Re-run with --write to update registry.py in place.",
            file=sys.stderr,
        )
        return
    new_src = src[: m.start(2)] + block + src[m.end(2):]
    open(REG, "w").write(new_src)
    print(f"folded {len(rows)} names -> {rnd} in {REG}")


if __name__ == "__main__":
    main()
