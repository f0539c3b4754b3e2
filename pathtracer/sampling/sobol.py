"""Owen-scrambled Sobol sampling (padded 4D), counter-based.

Net-new versus the reference: its RNG is a per-pixel mutable PCG stream
(common.glsl:27-49, seeded at raygen.rgen:105-106) - independent
uniforms only. This module adds a LOW-DISCREPANCY option
(``RenderConfig.sampler="sobol"``) with the exact same counter-based
contract as rng.py: every draw is a pure hash of
(pixel, sample, depth, salt, seed), so reproducibility, sharding
invariance and exact checkpoint/resume are untouched.

Design: padded 4D Sobol with hash-based Owen scrambling
(Burley, "Practical Hash-based Owen Scrambling", JCGT 2020):

- each (pixel, depth, salt, seed) group is its own scrambled copy of
  the first four Sobol dimensions;
- the SAMPLE INDEX is shuffled by a nested-uniform (Owen) scramble of
  the index keyed per group, which decorrelates groups while keeping
  every power-of-two prefix of the sequence a (0, m, s)-net;
- each output dimension is Owen-scrambled with its own key.

Because ``sample = frame * spp + s`` (camera.py), progressive
accumulation walks one global Sobol sequence per pixel/use - variance
decays near O(1/N) on smooth integrands instead of the reference
estimator's O(1/sqrt N).

Direction vectors are generated at import from the first Joe-Kuo
primitive polynomials (Bratley-Fox recurrence) rather than embedded as
opaque tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _direction_vectors() -> np.ndarray:
    """First four Sobol dimensions as [4, 32] u32 direction vectors.

    Dim 0 is the van der Corput sequence (v_k = 2^(31-k)); dims 1-3 use
    the Joe-Kuo (s, a, m) parameters with the standard recurrence
    v_k = a_1 v_{k-1} ^ ... ^ a_{s-1} v_{k-s+1} ^ v_{k-s} ^ (v_{k-s}>>s).
    """
    dims = [np.array([np.uint32(1) << (31 - k) for k in range(32)],
                     np.uint32)]
    joe_kuo = [(1, 0, [1]), (2, 1, [1, 3]), (3, 1, [1, 3, 1])]
    for s, a, m in joe_kuo:
        v = np.zeros(32, np.uint32)
        for k in range(s):
            v[k] = np.uint32(m[k]) << np.uint32(31 - k)
        for k in range(s, 32):
            x = v[k - s] ^ (v[k - s] >> np.uint32(s))
            for j in range(1, s):
                if (a >> (s - 1 - j)) & 1:
                    x ^= v[k - j]
            v[k] = x
        dims.append(v)
    return np.stack(dims)  # [4, 32]


_DIRS = _direction_vectors()


def reverse_bits(x):
    x = x.astype(_U32)
    x = (x >> _U32(16)) | (x << _U32(16))
    x = ((x & _U32(0x00FF00FF)) << _U32(8)) | ((x >> _U32(8)) & _U32(0x00FF00FF))
    x = ((x & _U32(0x0F0F0F0F)) << _U32(4)) | ((x >> _U32(4)) & _U32(0x0F0F0F0F))
    x = ((x & _U32(0x33333333)) << _U32(2)) | ((x >> _U32(2)) & _U32(0x33333333))
    x = ((x & _U32(0x55555555)) << _U32(1)) | ((x >> _U32(1)) & _U32(0x55555555))
    return x


def _laine_karras(x, seed):
    """Random permutation where each bit depends only on LOWER bits.

    Applied in the bit-reversed domain this is a (hash-approximate)
    Owen scramble (Laine & Karras 2011 via Burley 2020, eq. at par.3).
    """
    x = x + seed
    x = x ^ (x * _U32(0x6C50B47C))
    x = x ^ (x * _U32(0xB82F1E52))
    x = x ^ (x * _U32(0xC7AFE638))
    x = x ^ (x * _U32(0x8D22F6E6))
    return x


def owen_scramble(x, seed):
    """Nested-uniform (Owen) scramble of u32 fixed-point values in [0,1)."""
    return reverse_bits(_laine_karras(reverse_bits(x), seed))


def sobol4(index):
    """u32[...] sample indices -> u32[..., 4] raw Sobol points (dims 0-3).

    Uses the standard Gray-code (Antonov-Saleev) ordering - the same
    convention as scipy.stats.qmc.Sobol, which tests use as an oracle.
    """
    index = index.astype(_U32)
    index = index ^ (index >> _U32(1))
    acc = jnp.zeros(index.shape + (4,), _U32)
    for k in range(32):
        bit = ((index >> _U32(k)) & _U32(1)).astype(_U32)
        acc = acc ^ (bit[..., None] * jnp.asarray(_DIRS[:, k], _U32))
    return acc


def scrambled_sobol4(sample, group_key4):
    """Shuffled + scrambled 4D Sobol point for each lane.

    sample: u32[...] global sample index (frame * spp + s).
    group_key4: u32[..., 4] per-(pixel, depth, salt, seed) hash; component
    0 keys the index shuffle, 1-3 + a re-hash key the dim scrambles.
    """
    shuffle_seed = group_key4[..., 0]
    # Owen-scramble the INDEX = hash-based shuffle preserving prefix nets.
    idx = owen_scramble(sample.astype(_U32), shuffle_seed)
    pts = sobol4(idx)
    # Per-dimension scramble seeds, all independent of the shuffle seed.
    s1 = group_key4[..., 1]
    s2 = group_key4[..., 2]
    s3 = group_key4[..., 3]
    s0 = _laine_karras(s1 ^ _U32(0x9E3779B9), s2)
    out = jnp.stack([
        owen_scramble(pts[..., 0], s0),
        owen_scramble(pts[..., 1], s1),
        owen_scramble(pts[..., 2], s2),
        owen_scramble(pts[..., 3], s3),
    ], axis=-1)
    return out
