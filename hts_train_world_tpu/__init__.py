"""hts_train_world_tpu — TPU-native WORLD vocoder + HTS singing-synthesis framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
turbocast/HTS-train-WORLD (see SURVEY.md at the repo root for the layer map).
"""

__version__ = "0.1.0"

from hts_train_world_tpu.config import AnalysisConfig  # noqa: F401
