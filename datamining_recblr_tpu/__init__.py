"""TPU-native sequential recommendation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
RecBLR reference codebase (Frankie2030/DataMining_RecBLR): the
behavior-dependent linear recurrent unit (BD-LRU) model, SASRec and
BERT4Rec attention baselines, RecBole-style atomic-file data pipeline,
leave-one-out full-catalog evaluation, and the experiment drivers —
redesigned TPU-first (static shapes, jit-compiled train/eval steps,
GSPMD sharding over a device mesh, Pallas kernels for the hot scan op).
"""

__version__ = "0.1.0"

from datamining_recblr_tpu.config import Config  # noqa: F401
