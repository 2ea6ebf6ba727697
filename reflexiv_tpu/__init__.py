"""reflexiv_tpu: a TPU-native de novo genome assembler.

A from-scratch JAX/XLA/Pallas re-design of the Reflexiv method
(rhinempi/Reflexiv — Spark/Java): 2-bit canonical k-mer counting, edge-free
de Bruijn graph construction via both-direction fork filtering, and the
signature reflected-k-mer random-reflection contig extension, implemented as
fixed-shape array programs with sort + segment-join rounds instead of Spark
sort-shuffles, and `shard_map`/`all_to_all` over a device mesh instead of a
cluster. See SURVEY.md for the reference analysis this is built to.
"""

from .params import Params
from .records import Records

__version__ = "0.2.0"

__all__ = ["Params", "Records", "__version__"]
