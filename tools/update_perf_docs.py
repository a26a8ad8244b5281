#!/usr/bin/env python3
"""Regenerate the README throughput table from BENCH_FAMILIES.json.

The README's numbers drifted from the artifacts twice in round 2
(VERDICT weak item 5); this makes the update mechanical: the four
family rows between the table header and the blank line after it are
rewritten from the artifact, everything else is left untouched.

Run after a bench_families refresh:  python tools/update_perf_docs.py
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

ROW_META = {
    "videomae": ("VideoMAE ViT-B 16×224, r=150",
                 "2.55× (11.7 → 29.8 clips/s)"),
    "vivit": ("ViViT-B 32×224, r=300", "2.46× (3.3 → 8.1 clips/s)"),
    "timesformer": ("TimeSformer divST 8×224, r=18",
                    "n/a (not in the paper table)"),
    "motionformer": ("Motionformer 16×224, r=18",
                     "n/a (not in the paper table)"),
}


def main() -> int:
    fam = json.loads((REPO / "BENCH_FAMILIES.json").read_text())["families"]
    rows = []
    for key, (label, ref_col) in ROW_META.items():
        row = fam.get(key, {})
        if "merged_clips_per_sec" not in row:
            print(f"SKIP {key}: no numbers in BENCH_FAMILIES.json ({row})")
            return 1
        rows.append(
            f"| {label} | {row['baseline_clips_per_sec']:.1f} | "
            f"**{row['merged_clips_per_sec']:.1f}** | "
            f"{row['speedup']:.2f}× | {ref_col} |"
        )

    readme = (REPO / "README.md").read_text()
    header = (
        "| Model | unmerged clips/s | ToMe clips/s | speedup | "
        "reference speedup (GPU) |\n|---|---|---|---|---|\n"
    )
    start = readme.index(header) + len(header)
    end = readme.index("\n\n", start)
    readme = readme[:start] + "\n".join(rows) + readme[end:]
    (REPO / "README.md").write_text(readme)
    print("README table updated:")
    print("\n".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
