#!/usr/bin/env python3
"""Generate the shipped configs/ tree.

Emits the experiment configs of the reference benchmark (hyperparameter
values match configs/<model>/<dataset>/*.yaml of the reference repo so
results are comparable) in our config schema, plus ViViT model-json
files. Regenerate with ``python tools/gen_configs.py``.

Layout: configs/<model>/<dataset>/{tome_*.yaml, baselines, tome_train_*}.
Placeholders (<KINETICS-400-VIDEO> etc.) are substituted by the user.
"""

from __future__ import annotations

import copy
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "configs"

# ------------------------------------------------------------------ yaml emit

SECTION_ORDER = [
    "TRAIN", "DATA", "AUG", "MIXUP", "EPICKITCHENS", "SOLVER", "MODEL",
    "TIMESFORMER", "MOTIONFORMER", "VIVIT", "VIDEOMAE", "TOME", "TEST",
    "DATA_LOADER", "TENSORBOARD", "TPU",
]
TOP_ORDER = ["NUM_GPUS", "NUM_SHARDS", "RNG_SEED", "OUTPUT_DIR"]


def _fmt(v):
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    return str(v)


def dump_yaml(cfg: dict) -> str:
    lines = []
    for sec in SECTION_ORDER:
        if sec not in cfg:
            continue
        lines.append(f"{sec}:")
        for k, v in cfg[sec].items():
            lines.append(f"  {k}: {_fmt(v)}")
    for k in TOP_ORDER:
        if k in cfg:
            lines.append(f"{k}: {_fmt(cfg[k])}")
    return "\n".join(lines) + "\n"


def write(relpath: str, cfg: dict):
    p = OUT / relpath
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(dump_yaml(cfg))
    print(f"wrote {p.relative_to(REPO)}")


def merge(base: dict, *overlays: dict) -> dict:
    out = copy.deepcopy(base)
    for ov in overlays:
        for k, v in ov.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = {**out[k], **copy.deepcopy(v)}
            else:
                out[k] = copy.deepcopy(v)
    return out


# ------------------------------------------------------------- shared blocks

COMMON = {
    "DATA_LOADER": {"NUM_WORKERS": 4, "PIN_MEMORY": True},
    "NUM_GPUS": 1,
    "NUM_SHARDS": 1,
    "RNG_SEED": 0,
    "OUTPUT_DIR": ".",
    "TPU": {"COMPUTE_DTYPE": "bfloat16"},
}

K400_DATA = {
    "PATH_TO_DATA_DIR": "<KINETICS-400-VIDEO>",
    "PATH_PREFIX": "<KINETICS-400-PATH-PREFIX>",
    "TRAIN_JITTER_SCALES": [256, 320],
    "TRAIN_CROP_SIZE": 224,
    "TEST_CROP_SIZE": 224,
    "INPUT_CHANNEL_NUM": [3],
}

SSV2_DATA = {
    "PATH_TO_DATA_DIR": "<SOMETHING-SOMETHING-V2-VIDEO>",
    "PATH_PREFIX": "<SOMETHING-SOMETHING-V2-PATH-PREFIX>",
    "TRAIN_JITTER_SCALES": [256, 320],
    "TRAIN_CROP_SIZE": 224,
    "TEST_CROP_SIZE": 224,
    "INPUT_CHANNEL_NUM": [3],
    "INV_UNIFORM_SAMPLE": True,
    "RANDOM_FLIP": False,
    "REVERSE_INPUT_CHANNEL": False,
}

EPIC_SECTION = {
    "VISUAL_DATA_DIR": "<EPIC-KITCHENS-100-VIDEO>",
    "ANNOTATIONS_DIR": "<EPIC-KITCHENS-100-ANNOTATIONS>",
    "TRAIN_LIST": "EPIC_100_train.pkl",
    "VAL_LIST": "EPIC_100_validation.pkl",
    "TEST_LIST": "EPIC_100_validation.pkl",
    "TEST_SPLIT": "validation",
    "TRAIN_PLUS_VAL": False,
    "NUM_CLASSES": [97, 300],
    "PARTICIPANT_FIRST": False,
}

SGD_STEPS = {
    "BASE_LR": 0.005,
    "LR_POLICY": "steps_with_relative_lrs",
    "STEPS": [0, 11, 14],
    "LRS": [1, 0.1, 0.01],
    "MAX_EPOCH": 15,
    "MOMENTUM": 0.9,
    "WEIGHT_DECAY": 1e-4,
    "OPTIMIZING_METHOD": "sgd",
}

TOME = {"ENABLE": True, "R_VALUE": 0, "PROP_ATTN": True, "MODE": "merge"}


# ---------------------------------------------------------------- VideoMAE

VIDEOMAE_SECTION = {
    "MODEL": "vit_base_patch16_224",
    "TUBELET_SIZE": 2,
    "FC_DROP_RATE": 0.0,
    "DROP_RATE": 0.0,
    "DROP_PATH_RATE": 0.0,
    "ATTN_DROP_RATE": 0.0,
    "USE_MEAN_POOLING": True,
    "INIT_SCALE": 0.001,
}

videomae_base = merge(COMMON, {
    "TRAIN": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 8,
              "EVAL_PERIOD": 5, "CHECKPOINT_PERIOD": 5, "AUTO_RESUME": True},
    "DATA": merge(K400_DATA, {"NUM_FRAMES": 16, "SAMPLING_RATE": 1,
                              "MEAN": [0.485, 0.456, 0.406],
                              "STD": [0.229, 0.224, 0.225]}),
    "SOLVER": SGD_STEPS,
    "MODEL": {"MODEL_NAME": "VideoMAE", "NUM_CLASSES": 400,
              "ARCH": "videomae", "LOSS_FUNC": "cross_entropy"},
    "VIDEOMAE": VIDEOMAE_SECTION,
    # headline setting: PROP_ATTN False for VideoMAE (experiments.sh:33)
    "TOME": merge(TOME, {"R_VALUE": 150, "PROP_ATTN": False}),
    "TEST": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 32,
             "NUM_ENSEMBLE_VIEWS": 1, "NUM_SPATIAL_CROPS": 1,
             "CHECKPOINT_FILE_PATH": "<TEST-CHECKPOINT>"},
})

write("videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml", videomae_base)
write("videomae/ssv2/tome_VideoMAE_B_16_224_SSv2.yaml", merge(videomae_base, {
    "TRAIN": {"DATASET": "ssv2"},
    "DATA": merge(SSV2_DATA, {"NUM_FRAMES": 16, "SAMPLING_RATE": 1,
                              "MEAN": [0.485, 0.456, 0.406],
                              "STD": [0.229, 0.224, 0.225]}),
    "MODEL": {"NUM_CLASSES": 174},
    "TEST": {"DATASET": "ssv2"},
}))
videomae_epic = merge(videomae_base, {
    "TRAIN": {"DATASET": "epickitchens", "BATCH_SIZE": 32},
    "DATA": {"PATH_TO_DATA_DIR": "", "PATH_PREFIX": "", "SAMPLING_RATE": 2},
    "EPICKITCHENS": EPIC_SECTION,
    "MODEL": {"NUM_CLASSES": 400},
    "TEST": {"DATASET": "epickitchens", "BATCH_SIZE": 32},
})
write("videomae/epickitchens/tome_VideoMAE_B_16_224_EPICKITCHENS.yaml", videomae_epic)
write("videomae/epickitchens/tome_train_VideoMAE_B_16_224_EPICKITCHENS.yaml", merge(videomae_epic, {
    "TRAIN": {"BATCH_SIZE": 128, "CHECKPOINT_FILE_PATH": "<TRAIN-CHECKPOINT>"},
    "DATA": {"RANDOM_FLIP": False},
    "AUG": {"ENABLE": True, "AA_TYPE": "rand-m7-n4-mstd0.5-inc1"},
    "SOLVER": {"BASE_LR": 0.001, "LR_POLICY": "cosine", "WARMUP_START_LR": 0.0,
               "COSINE_END_LR": 2.0e-6, "WARMUP_EPOCHS": 5.0,
               "COSINE_AFTER_WARMUP": True, "MAX_EPOCH": 50, "MOMENTUM": 0.9,
               "WEIGHT_DECAY": 5e-2, "OPTIMIZING_METHOD": "adamw",
               "LAYER_DECAY": 0.75, "STEPS": [], "LRS": []},
    "VIDEOMAE": {"DROP_PATH_RATE": 0.1},
    "TEST": {"BATCH_SIZE": 128},
    "DATA_LOADER": {"NUM_WORKERS": 12},
    "OUTPUT_DIR": "<OUTPUT-DIR>",
}))


# ------------------------------------------------------------------- ViViT

def vivit_json(num_frames: int) -> str:
    return json.dumps({
        "architectures": ["ViViTForVideoClassification"],
        "attention_probs_dropout_prob": 0.0,
        "hidden_act": "gelu_fast",
        "hidden_dropout_prob": 0.0,
        "hidden_size": 768,
        "initializer_range": 0.02,
        "intermediate_size": 3072,
        "layer_norm_eps": 1e-06,
        "model_type": "vivit",
        "num_attention_heads": 12,
        "num_channels": 3,
        "num_hidden_layers": 12,
        "qkv_bias": True,
        "tubelet_size": [2, 16, 16],
        "video_size": [num_frames, 224, 224],
    }, indent=2) + "\n"


for rel, frames in [
    ("vivit/kinetics/tome_vivit_8x32_224.json", 32),
    ("vivit/kinetics/tome_vivit_8x16_224.json", 16),
    ("vivit/ssv2/tome_vivit_8x32_224.json", 32),
    ("vivit/epickitchens/tome_vivit_8x32_224.json", 32),
]:
    p = OUT / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(vivit_json(frames))
    print(f"wrote {p.relative_to(REPO)}")

vivit_base = merge(COMMON, {
    "TRAIN": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 8,
              "EVAL_PERIOD": 5, "CHECKPOINT_PERIOD": 5, "AUTO_RESUME": True},
    "DATA": merge(K400_DATA, {"NUM_FRAMES": 32, "SAMPLING_RATE": 2}),
    "SOLVER": SGD_STEPS,
    "MODEL": {"MODEL_NAME": "ViViT", "NUM_CLASSES": 400, "ARCH": "vivit",
              "LOSS_FUNC": "cross_entropy"},
    "VIVIT": {"CONFIG_PATH": "configs/vivit/kinetics/tome_vivit_8x32_224.json"},
    "TOME": merge(TOME, {"R_VALUE": 300}),
    "TEST": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 16,
             "NUM_ENSEMBLE_VIEWS": 1, "NUM_SPATIAL_CROPS": 1,
             "CHECKPOINT_FILE_PATH": "<TEST-CHECKPOINT>"},
})
write("vivit/kinetics/tome_vivit_8x32_224.yaml", vivit_base)
vivit_ssv2 = merge(vivit_base, {
    "TRAIN": {"DATASET": "ssv2", "BATCH_SIZE": 64,
              "CHECKPOINT_FILE_PATH": "<TRAIN-CHECKPOINT>"},
    "DATA": merge(SSV2_DATA, {
        "NUM_FRAMES": 32, "SAMPLING_RATE": 1,
        "TRAIN_JITTER_SCALES_RELATIVE": [0.9, 1.33],
        "TRAIN_JITTER_ASPECT_RELATIVE": [1.0, 1.0]}),
    "AUG": {"ENABLE": True, "RE_PROB": 0.0, "AA_TYPE": "rand-m20-n2-mstd0.5-inc1"},
    "SOLVER": {"BASE_LR": 0.01, "LR_POLICY": "cosine", "WARMUP_EPOCHS": 2.5,
               "WARMUP_START_LR": 0.0, "COSINE_AFTER_WARMUP": True,
               "MAX_EPOCH": 35, "MOMENTUM": 0.9, "WEIGHT_DECAY": 1e-4,
               "OPTIMIZING_METHOD": "sgd", "STEPS": [], "LRS": []},
    "MODEL": {"NUM_CLASSES": 174},
    "VIVIT": {"CONFIG_PATH": "configs/vivit/ssv2/tome_vivit_8x32_224.json"},
    "TEST": {"DATASET": "ssv2"},
})
write("vivit/ssv2/tome_vivit_8x32_224.yaml", vivit_ssv2)
write("vivit/ssv2/tome_train_vivit_8x32_224.yaml", merge(vivit_ssv2, {
    "TEST": {"BATCH_SIZE": 64, "CHECKPOINT_FILE_PATH": ""},
    "DATA_LOADER": {"NUM_WORKERS": 12},
    "OUTPUT_DIR": "<OUTPUT-DIR>",
}))
vivit_epic = merge(vivit_base, {
    "TRAIN": {"DATASET": "epickitchens", "BATCH_SIZE": 2},
    "DATA": {"PATH_TO_DATA_DIR": "", "PATH_PREFIX": ""},
    "EPICKITCHENS": EPIC_SECTION,
    "SOLVER": {"BASE_LR": 0.003125, "LR_POLICY": "cosine", "WARMUP_EPOCHS": 2.5,
               "WARMUP_START_LR": 0.0, "COSINE_AFTER_WARMUP": True,
               "MAX_EPOCH": 15, "STEPS": [], "LRS": []},
    "VIVIT": {"CONFIG_PATH": "configs/vivit/epickitchens/tome_vivit_8x32_224.json"},
    "TEST": {"DATASET": "epickitchens"},
})
write("vivit/epickitchens/tome_vivit_8x32_224.yaml", vivit_epic)
write("vivit/epickitchens/tome_train_vivit_8x32_224.yaml", merge(vivit_epic, {
    "TRAIN": {"BATCH_SIZE": 64, "CHECKPOINT_FILE_PATH": "<TRAIN-CHECKPOINT>"},
    "TEST": {"BATCH_SIZE": 64},
    "DATA_LOADER": {"NUM_WORKERS": 12},
    "OUTPUT_DIR": "<OUTPUT-DIR>",
}))


# -------------------------------------------------------------- TimeSformer

timesformer_base = merge(COMMON, {
    "TRAIN": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 8,
              "EVAL_PERIOD": 5, "CHECKPOINT_PERIOD": 5, "AUTO_RESUME": True},
    "DATA": merge(K400_DATA, {"NUM_FRAMES": 8, "SAMPLING_RATE": 32}),
    "TIMESFORMER": {"ATTENTION_TYPE": "divided_space_time"},
    "SOLVER": SGD_STEPS,
    "MODEL": {"MODEL_NAME": "TimeSformer", "NUM_CLASSES": 400,
              "ARCH": "timesformer", "LOSS_FUNC": "cross_entropy",
              "DROPOUT_RATE": 0.5},
    "TEST": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 64,
             "NUM_ENSEMBLE_VIEWS": 1, "NUM_SPATIAL_CROPS": 1,
             "CHECKPOINT_FILE_PATH": "<TEST-CHECKPOINT>"},
})

write("timesformer/kinetics/TimeSformer_divST_8x32_224.yaml", timesformer_base)
write("timesformer/kinetics/tome_TimeSformer_divST_8x32_224.yaml",
      merge(timesformer_base, {"TOME": merge(TOME, {"R_VALUE": 18})}))
write("timesformer/kinetics/TimeSformer_jointST_8x32_224.yaml",
      merge(timesformer_base, {"TIMESFORMER": {"ATTENTION_TYPE": "joint_space_time"}}))
write("timesformer/kinetics/TimeSformer_spaceOnly_8x32_224.yaml",
      merge(timesformer_base, {"TIMESFORMER": {"ATTENTION_TYPE": "space_only"}}))
write("timesformer/kinetics/TimeSformer_divST_96x4_224.yaml",
      merge(timesformer_base, {"DATA": {"NUM_FRAMES": 96, "SAMPLING_RATE": 4}}))
write("timesformer/kinetics/TimeSformer_divST_16x16_448.yaml",
      merge(timesformer_base, {"DATA": {"NUM_FRAMES": 16, "SAMPLING_RATE": 16,
                                        "TRAIN_JITTER_SCALES": [448, 512],
                                        "TRAIN_CROP_SIZE": 448,
                                        "TEST_CROP_SIZE": 448}}))

ts_ssv2 = merge(timesformer_base, {
    "TRAIN": {"DATASET": "ssv2"},
    "DATA": merge(SSV2_DATA, {"NUM_FRAMES": 8, "SAMPLING_RATE": 8}),
    "MODEL": {"NUM_CLASSES": 174},
    "TEST": {"DATASET": "ssv2"},
})
write("timesformer/ssv2/TimeSformer_divST_8_224.yaml", ts_ssv2)
write("timesformer/ssv2/tome_TimeSformer_divST_8_224.yaml",
      merge(ts_ssv2, {"TOME": merge(TOME, {"R_VALUE": 18})}))
write("timesformer/ssv2/TimeSformer_divST_64_224.yaml",
      merge(ts_ssv2, {"DATA": {"NUM_FRAMES": 64, "SAMPLING_RATE": 1}}))

ts_epic = merge(timesformer_base, {
    "TRAIN": {"DATASET": "epickitchens"},
    "DATA": {"PATH_TO_DATA_DIR": "", "PATH_PREFIX": "",
             "NUM_FRAMES": 8, "SAMPLING_RATE": 8},
    "EPICKITCHENS": EPIC_SECTION,
    "TEST": {"DATASET": "epickitchens"},
    "TOME": merge(TOME, {"R_VALUE": 18}),
})
write("timesformer/epickitchens/tome_TimeSformer_divST_8_224.yaml", ts_epic)
write("timesformer/epickitchens/tome_train_TimeSformer_divST_8_224.yaml", merge(ts_epic, {
    "TRAIN": {"BATCH_SIZE": 128, "CHECKPOINT_FILE_PATH": "<TRAIN-CHECKPOINT>"},
    "AUG": {"ENABLE": True, "RE_PROB": 0.0, "AA_TYPE": "rand-m15-n2-mstd0.5-inc1"},
    "EPICKITCHENS": {"PARTICIPANT_FIRST": False},
    "TEST": {"BATCH_SIZE": 128, "CHECKPOINT_FILE_PATH": ""},
    "DATA_LOADER": {"NUM_WORKERS": 12},
    "OUTPUT_DIR": "<OUTPUT-DIR>",
}))


# ------------------------------------------------------------- Motionformer

MOTIONFORMER_SECTION = {
    "PATCH_SIZE": 16,
    "PATCH_SIZE_TEMP": 2,
    "CHANNELS": 3,
    "EMBED_DIM": 768,
    "DEPTH": 12,
    "NUM_HEADS": 12,
    "MLP_RATIO": 4,
    "QKV_BIAS": True,
    "VIDEO_INPUT": True,
    "TEMPORAL_RESOLUTION": 8,
    "USE_MLP": True,
    "DROP": 0.0,
    "POS_DROPOUT": 0.0,
    "DROP_PATH": 0.0,
    "IM_PRETRAINED": True,
    "HEAD_DROPOUT": 0.0,
    "HEAD_ACT": "tanh",
    "PRETRAINED_WEIGHTS": "vit_1k",
    "ATTN_LAYER": "trajectory",
}

motionformer_base = merge(COMMON, {
    "TRAIN": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 8,
              "EVAL_PERIOD": 5, "CHECKPOINT_PERIOD": 5, "AUTO_RESUME": True,
              "MIXED_PRECISION": True},
    "DATA": merge(K400_DATA, {"NUM_FRAMES": 16, "SAMPLING_RATE": 4,
                              "MEAN": [0.5, 0.5, 0.5], "STD": [0.5, 0.5, 0.5]}),
    "MIXUP": {"LABEL_SMOOTH_VALUE": 0.2},
    "SOLVER": {"BASE_LR": 1e-4, "LR_POLICY": "steps_with_relative_lrs",
               "LRS": [1, 0.1, 0.01], "STEPS": [0, 20, 30], "MAX_EPOCH": 35,
               "MOMENTUM": 0.9, "WEIGHT_DECAY": 5e-2, "WARMUP_EPOCHS": 0.0,
               "OPTIMIZING_METHOD": "adamw"},
    "MOTIONFORMER": MOTIONFORMER_SECTION,
    "MODEL": {"NUM_CLASSES": 400, "ARCH": "motionformer",
              "MODEL_NAME": "Motionformer", "LOSS_FUNC": "cross_entropy"},
    "TEST": {"ENABLE": True, "DATASET": "kinetics", "BATCH_SIZE": 32,
             "NUM_ENSEMBLE_VIEWS": 1, "NUM_SPATIAL_CROPS": 1,
             "CHECKPOINT_FILE_PATH": "<TEST-CHECKPOINT>"},
})
write("motionformer/kinetics/motionformer_224_16x4.yaml", motionformer_base)
write("motionformer/kinetics/tome_motionformer_224_16x4.yaml",
      merge(motionformer_base, {"TOME": merge(TOME, {"R_VALUE": 18})}))
write("motionformer/kinetics/joint_224_16x4.yaml",
      merge(motionformer_base, {"MOTIONFORMER": {"ATTN_LAYER": "joint",
                                                 "POS_EMBED": "joint"}}))

mf_ssv2 = merge(motionformer_base, {
    "TRAIN": {"DATASET": "ssv2", "BATCH_SIZE": 32,
              "CHECKPOINT_EPOCH_RESET": True,
              "CHECKPOINT_FILE_PATH": "<TRAIN-CHECKPOINT>"},
    "DATA": merge(SSV2_DATA, {"NUM_FRAMES": 16, "SAMPLING_RATE": 4,
                              "MEAN": [0.5, 0.5, 0.5], "STD": [0.5, 0.5, 0.5]}),
    "MODEL": {"NUM_CLASSES": 174},
    "TEST": {"DATASET": "ssv2"},
})
write("motionformer/ssv2/motionformer_224_16x4.yaml", mf_ssv2)
write("motionformer/ssv2/tome_motionformer_224_16x4.yaml",
      merge(mf_ssv2, {"TOME": merge(TOME, {"R_VALUE": 18})}))

mf_epic = merge(motionformer_base, {
    "TRAIN": {"DATASET": "epickitchens", "BATCH_SIZE": 32,
              "CHECKPOINT_EPOCH_RESET": True},
    "DATA": {"PATH_TO_DATA_DIR": "", "PATH_PREFIX": ""},
    "EPICKITCHENS": EPIC_SECTION,
    "SOLVER": {"STEPS": [0, 30, 40], "MAX_EPOCH": 50},
    "TEST": {"DATASET": "epickitchens"},
})
write("motionformer/epickitchens/motionformer_224_16x4.yaml", mf_epic)
write("motionformer/epickitchens/tome_motionformer_224_16x4.yaml",
      merge(mf_epic, {"TOME": merge(TOME, {"R_VALUE": 18})}))

print("done")
