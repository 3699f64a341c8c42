"""The long-format trajectory CSV schema — the L2<->L3 interchange contract
(reference ``src/s01-dataset-generation.py:108-125``). Kept byte-compatible so
datasets produced by either framework interoperate."""

CSV_FIELDS = [
    "scene",
    "scene_type",
    "step",
    "step_time",
    "mass",
    "x",
    "y",
    "z",
    "vx",
    "vy",
    "vz",
    "ax",
    "ay",
    "az",
    "u",
    "k",
]
