"""necat_tpu — a TPU-native nanopore read-correction and de-novo assembly framework.

A from-scratch rebuild of the capabilities of xiaochuanle/NECAT (error correction,
overlap detection, trimming, string-graph assembly, contig bridging, polishing) as a
single JAX program: reads are 2-bit packed device arrays, the seeding / chaining /
alignment / consensus hot loops are batched XLA/Pallas kernels, the all-vs-all overlap
computation is tiled across a device mesh, and graph passes run host-side on NumPy.

Reference layer map: see SURVEY.md. The pipeline stages mirror
`necat.pl {correct|assemble|bridge}` (reference: src/pipeline/necat.pl).
"""

__version__ = "0.1.0"

from necat_tpu.io.seqio import read_fasta, write_fasta  # noqa: F401
from necat_tpu.io.readstore import ReadStore  # noqa: F401
