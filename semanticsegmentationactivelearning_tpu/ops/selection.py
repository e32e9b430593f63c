"""Set-based acquisition strategies (selection over pool embeddings).

The reference selects the K lowest per-image confidence scores
(active_learning.py:705-715). This module adds *diversity-based*
selection as a capability extension: greedy k-center ("core-set",
Sener & Savarese, arXiv:1708.00489) over pool embeddings — each pick
is the candidate farthest (L2) from the current labelled/selected set,
so the batch covers the pool instead of clustering on one confusing
mode the way pure-uncertainty batches can.

TPU mapping: everything stays O(N*D) memory — no [N,N] distance
matrix. The initial distance-to-centers pass streams column chunks of
the Gram product (one [N,D]x[D,chunk] MXU matmul per step,
min-accumulated), and each greedy pick updates the running
min-distance vector with a single [N,D]x[D] matvec. The greedy loop is
a ``lax.fori_loop``; no host round-trips. Scales to 100k+ pools
(Vistas' 18k training images: ~9 MB of embeddings instead of a 1.3 GB
matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(3, 4))
def k_center_greedy(embeddings: jnp.ndarray, centers: jnp.ndarray,
                    candidates: jnp.ndarray, k: int,
                    col_chunk: int = 1024):
    """Greedy k-center selection.

    :param embeddings: ``[N, D]`` pool embeddings (any float dtype)
    :param centers:    ``[N]`` bool — already-labelled examples (the
                       initial center set; may be empty)
    :param candidates: ``[N]`` bool — selectable examples (unlabelled)
    :param k:          number of picks (static). Picks are
                       prefix-stable — the first ``j`` picks of a
                       ``k``-run equal a ``j``-run exactly — so callers
                       with a varying pick count should compile once
                       with the maximum and slice, not re-jit per
                       count. Picks beyond ``candidates.sum()`` are
                       meaningless (the candidate pool is exhausted)
                       and must be sliced off by the caller.
    :param col_chunk:  center-columns per streamed distance block
    :returns: (picks ``[k]`` int32 indices into N,
               min_dist ``[N]`` float32 squared distance of every
               example to the *initial* center set — ``inf`` when no
               centers, ``-inf`` outside the candidate set; useful for
               coverage diagnostics)
    """
    emb = embeddings.astype(jnp.float32)
    n = emb.shape[0]
    sq = jnp.sum(emb * emb, axis=1)
    inf = jnp.float32(jnp.inf)

    def d2_to(j):
        """[N] squared distances to example ``j`` (one MXU matvec)."""
        d = sq - 2.0 * (emb @ emb[j]) + sq[j]
        return jnp.maximum(d, 0.0)

    # distance to the initial center set, streamed in column chunks:
    # each step is one [N,D]x[D,chunk] matmul + masked min-reduce, so
    # only an [N, chunk] block is ever live
    chunk = min(col_chunk, n)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))
    centers_p = jnp.pad(centers, (0, pad))  # padded rows: not centers

    def init_block(i, acc):
        cols = jax.lax.dynamic_slice(emb_p, (i * chunk, 0),
                                     (chunk, emb.shape[1]))
        csq = jax.lax.dynamic_slice(sq_p, (i * chunk,), (chunk,))
        cmask = jax.lax.dynamic_slice(centers_p, (i * chunk,), (chunk,))
        blk = sq[:, None] - 2.0 * (emb @ cols.T) + csq[None, :]
        blk = jnp.where(cmask[None, :], jnp.maximum(blk, 0.0), inf)
        return jnp.minimum(acc, jnp.min(blk, axis=1))

    min_dist = jax.lax.fori_loop(0, num_chunks, init_block,
                                 jnp.full((n,), inf))
    # non-candidates must never win the argmax
    min_dist = jnp.where(candidates, min_dist, -inf)
    init_min_dist = min_dist

    def body(i, carry):
        dist, picks = carry
        nxt = jnp.argmax(dist)
        picks = picks.at[i].set(nxt.astype(jnp.int32))
        dist = jnp.minimum(dist, d2_to(nxt))
        dist = dist.at[nxt].set(-inf)
        return dist, picks

    _, picks = jax.lax.fori_loop(
        0, k, body, (min_dist, jnp.full((k,), -1, jnp.int32)))
    return picks, init_min_dist


__all__ = ["k_center_greedy"]
