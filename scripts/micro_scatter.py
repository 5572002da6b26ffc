"""Microbench: attribute per-call cost of the correction hot path on the TPU.

Times, with explicit block_until_ready:
  1. h2d transfer of a [PB, L] uint8 pair batch
  2. extend_batch dispatch+compute
  3. scatter_pass_cols_mm (fwd+rev)
  4. consensus_packed
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NECAT_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
from necat_tpu.utils.device import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp, numpy as np
from necat_tpu.align.banded import extend_batch, OP_PAD
from necat_tpu.consensus import tags as tags_mod
from necat_tpu.consensus.backbone import consensus_packed

PB, L, W = 512, 12288, 128
TB, D = 64, 8
rng = np.random.default_rng(0)
qb = rng.integers(0, 4, (PB, L), dtype=np.uint8)
tb = qb.copy()
# mutate ~15%
mask = rng.random((PB, L)) < 0.15
tb[mask] = rng.integers(0, 4, mask.sum(), dtype=np.uint8)
qlens = np.full(PB, L - 100, np.int32)
tlens = np.full(PB, L - 100, np.int32)
aq = np.full(PB, (L - 100) // 2, np.int32)
at = aq.copy()

def t(name, fn, n=3):
    fn()  # warm/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:9.1f} ms")
    return r

print("device:", jax.devices()[0])

t("h2d 2x[512,12288] u8", lambda: (jnp.asarray(qb), jnp.asarray(tb)))

qbj, tbj = jnp.asarray(qb), jnp.asarray(tb)
qlj, tlj = jnp.asarray(qlens), jnp.asarray(tlens)
aqj, atj = jnp.asarray(aq), jnp.asarray(at)

res = t("extend_batch", lambda: extend_batch(qbj, qlj, tbj, tlj, aqj, atj, W=W))

st = t("stats d2h", lambda: np.asarray(res.stats), n=3)

Lt = L
weights = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
covten = jnp.zeros((TB + 1, Lt), jnp.int32)
pair_row = jnp.asarray(rng.integers(0, TB, PB, dtype=np.int32))
pair_w = jnp.ones(PB, jnp.float32)
tsz = jnp.full(PB, L - 100, jnp.int32)

rc = tags_mod.pad_cols_to(res.right_cols, Lt, OP_PAD)
ri = tags_mod.pad_cols_to(res.right_insb, Lt, 0)

def sc():
    w = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
    c = jnp.zeros((TB + 1, Lt), jnp.int32)
    w, c = tags_mod.scatter_pass_cols_mm(w, c, rc, ri, res.right_lead,
                                         res.right_leadb, res.right_jc,
                                         atj, pair_row, pair_w, tsz,
                                         reversed_part=False)
    return w, c

w2, c2 = t("scatter_mm fwd (incl alloc)", sc)

t("consensus_packed", lambda: consensus_packed(w2[:TB], c2[:TB], 4, 0.2, 1.0))
