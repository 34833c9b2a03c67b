"""Machine-derived COVERAGE.md totals — VERDICT r3 directive #8.

Imports ``__ray_entry__`` (no Ray session needed: queries() builds
its dict of callables without executing any) and regenerates the
marker-delimited block at the top of COVERAGE.md with the live
query / SQL-checked / rows-only totals plus the full gate-entry
index, so documented totals can never drift from code again.

Usage:
    python tools/coverage_index.py            # rewrite the block
    python tools/coverage_index.py --check    # exit 1 if stale
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN = "<!-- BEGIN GENERATED TOTALS (tools/coverage_index.py) -->"
END = "<!-- END GENERATED TOTALS -->"


def generated_block() -> str:
    sys.path.insert(0, str(REPO))
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    unknown = sorted(set(o) - set(q))
    if unknown:
        raise SystemExit(
            f"oracle_sql() keys missing from queries(): {unknown}")
    sql = sorted(set(q) & set(o))
    rows_only = sorted(set(q) - set(o))
    lines = [
        BEGIN,
        "",
        f"**Gate totals (derived from `__ray_entry__` at generation "
        f"time): {len(q)} queries / {len(sql)} SQL-checked / "
        f"{len(rows_only)} rows-only.**",
        "",
        "Rows-only entries (no SQL-expressible oracle; driver "
        "records the weaker rows+schema check): "
        + ", ".join(f"`{k}`" for k in rows_only) + ".",
        "",
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    path = REPO / "COVERAGE.md"
    text = path.read_text()
    block = generated_block()
    if BEGIN in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        new = head + block + tail
    else:
        # insert after the first paragraph (ends at first blank-line
        # pair following the title)
        first_break = text.index("\n\n", text.index("\n")) + 2
        new = text[:first_break] + block + "\n\n" + text[first_break:]
    if check:
        if new != text:
            print("COVERAGE.md generated totals are STALE — run "
                  "python tools/coverage_index.py")
            return 1
        # VERDICT r4 #8: every queries() key must appear as a
        # backticked reference in the HAND-WRITTEN part of
        # COVERAGE.md — a gate entry can't land undocumented.
        sys.path.insert(0, str(REPO))
        import __ray_entry__ as entry

        head2, rest2 = text.split(BEGIN, 1)
        _, tail2 = rest2.split(END, 1)
        manual = head2 + tail2
        undocumented = sorted(
            k for k in entry.queries() if f"`{k}`" not in manual)
        if undocumented:
            print("COVERAGE.md is missing table rows for gate "
                  f"queries: {undocumented}")
            return 1
        print("COVERAGE.md totals up to date; all "
              f"{len(entry.queries())} gate queries documented")
        return 0
    if new != text:
        path.write_text(new)
        print("COVERAGE.md totals regenerated")
    else:
        print("COVERAGE.md totals already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
