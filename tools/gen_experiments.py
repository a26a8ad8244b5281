"""Generate experiments.sh — the full benchmark experiment grid.

Reproduces the reference grid (reference: experiments.sh:1-604) row for
row: same sections, same configs, same ``--opts`` (including the
``<WANDB-PROJECT>`` / ``<SAVE-RESULTS-PATH>`` placeholders the reference
leaves for the user), against the vtm CLIs. The grid is emitted as
commented rows exactly like the reference (uncomment / pipe a section to
run); ``--section <title>`` prints a section's rows uncommented with
W&B disabled for direct execution.

Run ``python tools/gen_experiments.py`` from the repo root to rewrite
``experiments.sh``; a parity test diffs the generated rows against the
reference (tests/test_config.py).
"""

from __future__ import annotations

import argparse
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]

MODELS = ("vivit", "timesformer", "motionformer", "videomae")
DATASETS = ("kinetics", "ssv2", "epickitchens")

CFG = {
    ("vivit", d): f"configs/vivit/{d}/tome_vivit_8x32_224.yaml" for d in DATASETS
}
CFG.update({
    ("timesformer", "kinetics"): "configs/timesformer/kinetics/tome_TimeSformer_divST_8x32_224.yaml",
    ("timesformer", "ssv2"): "configs/timesformer/ssv2/tome_TimeSformer_divST_8_224.yaml",
    ("timesformer", "epickitchens"): "configs/timesformer/epickitchens/tome_TimeSformer_divST_8_224.yaml",
})
CFG.update({
    ("motionformer", d): f"configs/motionformer/{d}/tome_motionformer_224_16x4.yaml"
    for d in DATASETS
})
CFG.update({
    ("videomae", "kinetics"): "configs/videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml",
    ("videomae", "ssv2"): "configs/videomae/ssv2/tome_VideoMAE_B_16_224_SSv2.yaml",
    ("videomae", "epickitchens"): "configs/videomae/epickitchens/tome_VideoMAE_B_16_224_EPICKITCHENS.yaml",
})

# dataset-major enumeration, model order as in the reference
ALL12 = [(m, d) for d in DATASETS for m in MODELS]
# the merging-ratio sections skip vivit/ssv2 (reference experiments.sh:29-93)
MAX11 = [(m, d) for (m, d) in ALL12 if (m, d) != ("vivit", "ssv2")]

WANDB = "WANDB.ENABLE True WANDB.PROJECT <WANDB-PROJECT>"
TIME_OPTS = "MODEL_BENCHMARK.WARMUP_ITERATIONS 5 MODEL_BENCHMARK.ITERATIONS 100 TEST.BATCH_SIZE 8"

# Roughly-optimal r per model (reference paper table) and the ratio grid:
# max merging halves the tokens at every layer; 25% / 12.5% / 6.25% keep
# that fraction of the max r.
R_OPT = {"vivit": 300, "timesformer": 18, "motionformer": 18, "videomae": 150}
R_MAX = {"vivit": 1568, "timesformer": 98, "motionformer": 98, "videomae": 784}
R_25 = {"vivit": 784, "timesformer": 49, "motionformer": 49, "videomae": 392}
R_125 = {"vivit": 392, "timesformer": 24, "motionformer": 24, "videomae": 196}
R_625 = {"vivit": 196, "timesformer": 12, "motionformer": 12, "videomae": 98}


def tome(model: str, r: int, extra: str = "") -> str:
    """The TOME opts string for a model at a given r; VideoMAE keeps the
    reference's PROP_ATTN False quirk (it was finetuned without it)."""
    s = f"TOME.ENABLE True TOME.R_VALUE {r}"
    if model == "videomae":
        s += " TOME.PROP_ATTN False"
    if extra:
        s += f" {extra}"
    return s


def emit() -> list[str]:
    lines: list[str] = []

    def section(title: str):
        if lines:
            lines.append("")
        lines.append(f"# {title}")

    def row(tool: str, model: str, dataset: str, opts: str = ""):
        prog = "tools/model_benchmark.py" if tool == "bench" else "tools/run_net.py"
        parts = [f"#python {prog} --cfg {CFG[model, dataset]} --opts TRAIN.ENABLE False"]
        if opts:
            parts.append(opts)
        lines.append(" ".join(parts) + ";")

    def ratio_section(title: str, rs: dict, combos, tool="run", extra=""):
        section(title)
        for m, d in combos:
            opts = f"{WANDB} {tome(m, rs[m], extra)}"
            if tool == "bench":
                # the reference appends TIME_OPTS before any TOME.SCHEDULE
                if extra.startswith("TOME.SCHEDULE"):
                    opts = f"{WANDB} {tome(m, rs[m])} {TIME_OPTS} {extra}"
                else:
                    opts = f"{WANDB} {tome(m, rs[m], extra)} {TIME_OPTS}"
            row(tool, m, d, opts)

    section("Baselines")
    for m, d in ALL12:
        row("run", m, d, WANDB)
    section("Baselines (time)")
    for m, d in ALL12:
        row("bench", m, d, f"{WANDB} {TIME_OPTS}")

    ratio_section("Max merging", R_MAX, MAX11)
    ratio_section("25% merging", R_25, MAX11)
    ratio_section("12.5% merging", R_125, MAX11)
    ratio_section("6.25% merging", R_625, MAX11)
    ratio_section("Roughly optimal merging", R_OPT, MAX11)
    ratio_section("Decreasing roughly optimal merging", R_OPT, ALL12, extra="TOME.SCHEDULE -1")
    ratio_section("Increasing roughly optimal merging", R_OPT, ALL12, extra="TOME.SCHEDULE 1")
    ratio_section("Roughly optimal merging (time)", R_OPT, ALL12, tool="bench")
    ratio_section("Decreasing roughly optimal merging (time)", R_OPT, ALL12, tool="bench", extra="TOME.SCHEDULE -1")
    ratio_section("Increasing roughly optimal merging (time)", R_OPT, ALL12, tool="bench", extra="TOME.SCHEDULE 1")

    section("Roughly optimal with concat head aggregation")
    for m, d in [("vivit", "kinetics"), ("videomae", "kinetics"),
                 ("videomae", "ssv2"), ("vivit", "epickitchens"),
                 ("videomae", "epickitchens")]:
        row("run", m, d, f"{WANDB} {tome(m, R_OPT[m], 'TOME.HEAD_AGGREGATION concat')}")

    for mode in ("random_drop", "drop", "random_merge"):
        name = {"random_drop": "random dropout", "drop": "dropout",
                "random_merge": "random merging"}[mode]
        ratio_section(f"Roughly optimal with {name}", R_OPT, ALL12, extra=f"TOME.MODE {mode}")
        ratio_section(f"Decreasing roughly optimal with {name}", R_OPT, ALL12,
                      extra=f"TOME.MODE {mode} TOME.SCHEDULE -1")
        ratio_section(f"Increasing roughly optimal with {name}", R_OPT, ALL12,
                      extra=f"TOME.MODE {mode} TOME.SCHEDULE 1")
        # (time) rows keep TOME.MODE before the benchmark opts
        section(f"Roughly optimal with {name} (time)")
        for m, d in ALL12:
            row("bench", m, d, f"{WANDB} {tome(m, R_OPT[m], f'TOME.MODE {mode}')} {TIME_OPTS}")

    section("Roughly optimal with duplicated layers")
    dup_combos = [("vivit", "kinetics"), ("videomae", "kinetics"),
                  ("videomae", "ssv2"), ("vivit", "epickitchens"),
                  ("videomae", "epickitchens")]
    for layer in (0, 11):
        for m, d in dup_combos:
            row("run", m, d, f"{WANDB} {tome(m, R_OPT[m], f'TOME.LAYER_TO_DUPLICATE {layer} TOME.LAYER_QUANTITY 12')}")

    section("Hybrid results")
    for m, thr in (("vivit", 0.4), ("videomae", 0.8)):
        for d in DATASETS:
            row("run", m, d, f"{WANDB} {tome(m, R_OPT[m], f'TOME.MODE hybrid TOME.THRESHOLD {thr}')}")

    # r sweeps: 1/16th..16/16th of the max-merging r, ascending
    VIVIT_SWEEP = [98 * i for i in range(1, 17)]
    VMAE_SWEEP = [49 * i for i in range(1, 17)]

    def curve(title: str, tool: str, extra: str = ""):
        section(title)
        for r in VIVIT_SWEEP:
            opts = f"{WANDB} {tome('vivit', r)}"
            if tool == "bench":
                opts += f" {TIME_OPTS}"
            if extra:
                opts += f" {extra}"
            row(tool, "vivit", "kinetics", opts)
        for r in VMAE_SWEEP:
            opts = f"{WANDB} {tome('videomae', r)}"
            if tool == "bench":
                opts += f" {TIME_OPTS}"
            if extra:
                opts += f" {extra}"
            row(tool, "videomae", "kinetics", opts)

    curve("Accuracy curve", "run")
    curve("Time curve", "bench")
    curve("Accuracy curve (decreasing schedule)", "run", "TOME.SCHEDULE -1")
    curve("Time curve (decreasing schedule)", "bench", "TOME.SCHEDULE -1")
    curve("Accuracy curve (increasing schedule)", "run", "TOME.SCHEDULE 1")
    curve("Time curve (increasing schedule)", "bench", "TOME.SCHEDULE 1")

    # equal-token-budget comparison: ViViT at 16 frames (multiples of 49)
    # vs VideoMAE at 32 frames (multiples of 98)
    section("Accuracy curve (diff between ViViT and VideoMAE)")
    for r in [49 * i for i in range(1, 17)]:
        row("run", "vivit", "kinetics",
            f"{WANDB} {tome('vivit', r)} DATA.NUM_FRAMES 16 VIVIT.CONFIG_PATH <VIVIT-JSON-CONFIG-PATH>")
    for r in [98 * i for i in range(1, 17)]:
        row("run", "videomae", "kinetics",
            f"{WANDB} {tome('videomae', r)} DATA.NUM_FRAMES 32 TEST.BATCH_SIZE 8")

    section("Confusion matrix results")
    row("run", "vivit", "epickitchens", "TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")
    row("run", "videomae", "epickitchens", "TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")
    row("run", "vivit", "epickitchens",
        f"{tome('vivit', 300)} TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")
    row("run", "videomae", "epickitchens",
        f"{tome('videomae', 150)} TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")
    row("run", "vivit", "epickitchens",
        f"{tome('vivit', 400)} TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")
    row("run", "videomae", "epickitchens",
        f"{tome('videomae', 200)} TEST.SAVE_RESULTS_PATH <SAVE-RESULTS-PATH>")

    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", help="print one section's rows uncommented, W&B off")
    ap.add_argument("--check", action="store_true",
                    help="verify every cfg referenced exists")
    args = ap.parse_args()
    lines = emit()
    if args.check:
        import re

        missing = set()
        for ln in lines:
            m = re.search(r"--cfg (\S+)", ln)
            if m and not (REPO / m.group(1)).exists():
                missing.add(m.group(1))
        if missing:
            raise SystemExit(f"missing configs: {sorted(missing)}")
        print(f"all configs present ({len(lines)} lines)")
        return
    if args.section:
        active = False
        for ln in lines:
            if ln.startswith("# "):
                active = ln[2:] == args.section
            elif active and ln.startswith("#python"):
                print(ln[1:].rstrip(";").replace(
                    f"{WANDB} ", "").replace(f" {WANDB}", ""))
        return
    out = REPO / "experiments.sh"
    header = (
        "#!/usr/bin/env bash\n"
        "## Full experiment grid of the benchmark — generated by\n"
        "## tools/gen_experiments.py; reproduces the reference grid\n"
        "## (reference: experiments.sh) 1:1 against the vtm CLIs.\n"
        "## Rows are commented like the reference: substitute the <...>\n"
        "## placeholders and uncomment to run, or print a section with\n"
        "##   python tools/gen_experiments.py --section 'Roughly optimal merging'\n"
    )
    out.write_text(header + "\n" + "\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
