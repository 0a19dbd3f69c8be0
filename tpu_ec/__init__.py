"""tpu-ec: TPU-native finite-field and elliptic-curve kernel library.

A from-scratch JAX/Pallas rebuild of the capabilities of
kriptohaberciniz/0g-ec-gpu (the 0G fork of Filecoin's ec-gpu CUDA/OpenCL
generator + runtime): Montgomery field arithmetic (BLS12-381 / BN254,
Fr/Fq/Fp2), radix-N NTT over fields and EC groups, Pippenger windowed-bucket
MSM (G1/G2, signed windows), with multi-chip execution via shard_map
collectives.  See SURVEY.md for the layer-by-layer mapping to the reference.
"""

from . import fields

__version__ = "0.1.0"
