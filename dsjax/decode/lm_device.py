"""Device-resident word n-gram LM for ON-DEVICE beam search LM fusion.

The reference scores its KenLM through the host ctcdecode C++ extension
(reference decoder.py:69-74), forcing a device->host posterior copy per
batch. Here the whole Katz-backoff scorer lives in HBM as open-addressing
hash tables so the beam search scan (dsjax.decode.beam_device) can fuse
``alpha * ln P(word | context) + beta`` without leaving the device:

* every n-gram order is one SINGLE-PROBE bucketed hash table packed
  bucket-major — two independent 32-bit check keys plus bitcast float32
  log10-prob and backoff per slot — so a query is ONE contiguous
  (BUCKET * 16)-byte row gather followed by a branch-free key-match
  select (collision odds ~2^-64 per pair, the same standard as the
  beam's exact prefix merging). TPU gather cost scales with gathered ROW
  count, not bytes — and 256-byte rows ride the wide-row fast path
  (measured 21 vs 49 ns/row on v5e) — so one 16-slot bucket beats the
  former two-choice pair of narrower buckets ~2x at identical hit
  semantics; the build simply grows the table until no bucket overflows
  (load 0.25 at the start point, so at most a doubling or two);
* decoder-side words are identified by two rolling hashes over their LABEL
  indices (beams never materialize strings); n-gram keys fold those hash
  PAIRS directly — there is no word-id indirection, so nothing serializes
  ahead of the per-order probe gathers (the former vocab->id->key chain
  put a dependent vocab gather in front of every n-gram probe). The
  ``order`` probes run as SEPARATE rank-3 gathers, which Mosaic lowers
  ~3.7x faster than one stacked (..., J)-indexed gather (see
  _probe_packed);
* scoring follows dsjax.decode.lm.ArpaLM._score exactly: P(w|ctx) from the
  longest matching order, else backoff(ctx) + P(w|shorter ctx), OOV ->
  <unk> unigram (or -100 log10). An OOV word's hash pair matches no table
  entry — the same miss path the host takes for unknown words — and
  absent context slots carry an EMPTY_KEY sentinel excluded via the
  probes' valid flags.

n-grams containing <s>, </s> or <unk> are dropped at build time: the
decoder can never produce those tokens, so the host scorer never finds
them either (the <unk> unigram survives as the scalar OOV penalty).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np
from jax.tree_util import register_pytree_node_class

from dsjax.labels import LabelMap

LOG10_TO_LN = math.log(10.0)

# word-char rolling-hash multipliers (over label indices, seed 1)
CHAR_A1 = np.uint32(1000003)
CHAR_A2 = np.uint32(10007)
CHAR_SEED = np.uint32(1)
# n-gram key fold multipliers (over word ids)
FOLD_A1 = np.uint32(2654435761)
FOLD_A2 = np.uint32(2246822519)
FOLD_SEED = np.uint32(2166136261)
# bucket-index mixer (ONE bucket choice per key — a probe is one gather)
MIX1 = np.uint32(0x9E3779B1)
MIX2 = np.uint32(0x85EBCA6B)
EMPTY_KEY = np.uint32(0xFFFFFFFF)
BUCKET = 16  # slots per bucket: one probe = ONE 16-slot contiguous gather
# (the builder starts at mean load 4/bucket and doubles the table until
# no bucket holds more than BUCKET keys — a couple of doublings at most).
# 16 slots * 4 u32 = 64 u32 = 256 B per row: measured on v5e, XLA's row
# gather switches to a ~2.5x faster path at >= 64 elements per row
# (21 ns/row vs 49 ns/row at 32 elems), so the WIDER bucket is cheaper
# than the 8-slot one despite fetching twice the bytes.

# absent-context sentinel: a context slot with h1 == EMPTY_KEY holds no
# word yet (real word hashes are remapped away from EMPTY_KEY at build and
# query time, so the sentinel is unambiguous)
CTX_ABSENT = EMPTY_KEY


def _mix_index(k1, k2, mask):
    # murmur3-style finalizer: the raw (k1*MIX1)^(k2*MIX2) combine
    # avalanches LOW bits poorly (bit i of a product depends only on
    # bits <= i of its inputs), and `& mask` keeps exactly those low
    # bits — measured table loads sagged to 0.06-0.12 from overflow
    # doublings without it (target 0.25), tripling both the table bytes
    # and the HBM gather's table-size cost
    h = (k1 * MIX1) ^ (k2 * MIX2)
    h = (h ^ (h >> np.uint32(16))) * np.uint32(0x7FEB352D)
    h = (h ^ (h >> np.uint32(15))) * np.uint32(0x846CA68B)
    return (h ^ (h >> np.uint32(16))) & mask


def _fold_ids(ids: np.ndarray, mult: np.uint32,
              reserve_empty: bool = False) -> np.ndarray:
    """Fold an (..., n) int array (word hash-pair columns) into one uint32
    key.

    ``reserve_empty`` keeps EMPTY_KEY out of the result; it must be applied
    ONLY to the key1 column (the one vacancy is encoded in) and mirrored by
    the runtime fold (_fold_pairs_jnp remaps h1 only) so build-time and
    query-time key transforms stay identical."""
    h = np.full(ids.shape[:-1], FOLD_SEED, np.uint32)
    for j in range(ids.shape[-1]):
        h = h * mult + (ids[..., j].astype(np.int64) + 2).astype(np.uint32)
    if reserve_empty:
        h = np.where(h == EMPTY_KEY, h ^ np.uint32(1), h)
    return h


def _word_hash(label_ids) -> "tuple[int, int]":
    """Canonical (h1, h2) word identity: two rolling hashes over the
    word's label-index sequence, h1 remapped away from EMPTY_KEY (the
    table-vacancy / absent-context sentinel). The device beam maintains
    the same pair incrementally as characters append (beam_device)."""
    h1, h2 = int(CHAR_SEED), int(CHAR_SEED)
    for ci in label_ids:
        h1 = (h1 * int(CHAR_A1) + ci + 1) & 0xFFFFFFFF
        h2 = (h2 * int(CHAR_A2) + ci + 1) & 0xFFFFFFFF
    if h1 == int(EMPTY_KEY):
        h1 ^= 1
    return h1, h2


@register_pytree_node_class
class HashTable:
    """Single-probe bucketed table: data (n_buckets * BUCKET, 4) uint32 =
    [key1, key2, bitcast(f32 val0), bitcast(f32 val1)]; every key lives
    in its ONE _mix_index bucket, so a query is exactly one contiguous
    BUCKET-row gather — a FIXED BUCKET*16-byte fetch. (History: linear
    probing's worst-case cluster, 28-42 rows at 50% load over millions
    of keys, set the probe window; the two-choice successor fixed that
    but paid TWO gather rows per probe, and TPU random-row gathers are
    latency-bound per ROW — one 16-slot bucket at a quarter the load is
    the same hit semantics at half the gather rows, and its 256-byte row
    rides XLA's wide-row gather fast path.)
    ``depth`` = BUCKET (kept for aux-data compatibility)."""

    def __init__(self, data, depth: int = BUCKET):
        self.data = data
        self.depth = int(depth)

    @property
    def mask(self) -> int:
        """Bucket-index mask (n_buckets - 1). Host tables are slot-major
        (S, 4); device tables are bucket-major (n_buckets, BUCKET * 4) so
        one probe is ONE 64-byte row gather (see device())."""
        if self.data.shape[-1] == 4:
            return len(self.data) // BUCKET - 1
        return len(self.data) - 1

    def tree_flatten(self):
        return (self.data,), self.depth

    @classmethod
    def tree_unflatten(cls, depth, children):
        return cls(children[0], depth)


def _build_table(k1: np.ndarray, k2: np.ndarray, v0: np.ndarray,
                 v1: np.ndarray) -> HashTable:
    """Bulk single-probe bucket insertion (vectorized): every key goes to
    its one _mix_index bucket; if any bucket overflows BUCKET slots the
    table doubles and retries (start load = 4 keys per 16-slot bucket —
    n*4/BUCKET buckets before power-of-two rounding — so the Poisson
    tail costs at most a doubling or two for real LMs)."""
    n = len(k1)
    k1 = np.asarray(k1, np.uint32)
    k2 = np.asarray(k2, np.uint32)
    v0u = np.asarray(v0, np.float32).view(np.uint32)
    v1u = np.asarray(v1, np.float32).view(np.uint32)
    n_buckets = 1 << max(3, int(np.ceil(np.log2(max(1, n) * 4 / BUCKET))))
    while True:
        mask = np.uint32(n_buckets - 1)
        cur = _mix_index(k1, k2, mask).astype(np.int64)
        counts = np.bincount(cur, minlength=n_buckets)
        if counts.max(initial=0) <= BUCKET:
            break
        n_buckets *= 2
    order = np.argsort(cur, kind="stable")
    seg_start = np.zeros(n_buckets, np.int64)
    seg_start[1:] = np.cumsum(counts)[:-1]
    slot = np.empty(n, np.int64)
    slot[order] = (np.arange(n) - seg_start[cur[order]]) + cur[order] * BUCKET
    data = np.zeros((n_buckets * BUCKET, 4), np.uint32)
    data[:, 0] = EMPTY_KEY
    data[slot, 0] = k1
    data[slot, 1] = k2
    data[slot, 2] = v0u
    data[slot, 3] = v1u
    return HashTable(data, BUCKET)


@register_pytree_node_class
class PackedLM:
    """Pytree of the device LM; order/unk_logp/offsets are static aux.

    ``ngrams`` holds ALL n-gram tables concatenated into ONE bucket-major
    (n_buckets_total, BUCKET * 4) uint32 array, with static per-table base
    offsets / index masks / probe depths — the per-step Katz-backoff
    scoring is one independent row gather per n-gram order, each covering
    every beam (keys fold word hash pairs directly; no vocab probe
    precedes any of them, so the gathers issue concurrently)."""

    def __init__(self, order: int, unk_logp: float,
                 ngrams, bases, masks, depths):
        self.order = int(order)
        self.unk_logp = float(unk_logp)
        self.ngrams = ngrams
        self.bases = tuple(bases)
        self.masks = tuple(masks)
        self.depths = tuple(depths)

    def tree_flatten(self):
        return ((self.ngrams,),
                (self.order, self.unk_logp, self.bases, self.masks,
                 self.depths))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (ngrams,) = children
        return cls(aux[0], aux[1], ngrams, aux[2], aux[3], aux[4])


class DeviceNgramLM:
    """Packed word n-gram LM (host build -> numpy; .device() -> jnp pytree).

    Built from an ARPA path (optionally .gz) or any object with the ArpaLM
    attributes (``ngrams`` list of dicts, ``order``)."""

    SPECIALS = ("<s>", "</s>", "<unk>")

    def __init__(self, lm, labels: Sequence[str], blank_index: int = 0):
        from dsjax.decode.lm import ArpaLM, BINARY_MAGIC2

        if isinstance(lm, str):
            with open(lm, "rb") as f:
                head = f.read(8)
            if head == BINARY_MAGIC2:
                # KenLM-binary-equivalent fast path: pack the device tables
                # straight from the mmap-shaped v2 binary (no ARPA re-parse)
                self._init_from_binary(lm, labels, blank_index)
                return
            lm = ArpaLM(lm)
        self.order = lm.order
        label_map = LabelMap(labels, blank_index)
        unk = lm.ngrams[0].get(("<unk>",)) if lm.order >= 1 else None
        self.unk_logp = float(unk[0]) if unk is not None else -100.0

        # --- word identities: (h1, h2) rolling hashes over label indices
        # (no dense-id vocab table: n-gram keys fold the pairs directly,
        # so the query side needs no vocab probe ahead of the n-gram probe)
        word_hash = {}
        for (w,) in lm.ngrams[0]:
            if w in self.SPECIALS:
                continue
            ids = [label_map.char_to_int.get(ch) for ch in w]
            if any(i is None for i in ids):
                continue  # not formable by the decoder -> never looked up
            word_hash[w] = _word_hash(ids)
        self.n_vocab = len(word_hash)

        # --- n-gram tables (hash pairs folded oldest -> newest)
        self.tables: List[HashTable] = []
        for n in range(1, self.order + 1):
            keys, logps, boffs = [], [], []
            for ngram, (logp, boff) in lm.ngrams[n - 1].items():
                if any(w in self.SPECIALS or w not in word_hash
                       for w in ngram):
                    continue
                keys.append([c for w in ngram for c in word_hash[w]])
                logps.append(logp)
                boffs.append(boff)
            ids = (np.asarray(keys, np.int64).reshape(len(keys), 2 * n)
                   if keys else np.zeros((0, 2 * n), np.int64))
            self.tables.append(_build_table(
                _fold_ids(ids, FOLD_A1, reserve_empty=True),
                _fold_ids(ids, FOLD_A2),
                np.asarray(logps, np.float32), np.asarray(boffs, np.float32)))

    def _init_from_binary(self, path: str, labels: Sequence[str],
                          blank_index: int) -> None:
        """Build the device tables from a DSLMBIN2 binary (vectorized —
        skips the python ARPA parse entirely). The binary's dense word ids
        are translated to the canonical (h1, h2) hash pairs; n-grams
        containing specials or label-unformable words are dropped, exactly
        as the ARPA build drops them (the decoder can never produce those
        words, so the host scorer never finds them either)."""
        from dsjax.decode.lm import read_binary_lm_v2

        raw = read_binary_lm_v2(path)
        self.order = raw["order"]
        label_map = LabelMap(labels, blank_index)
        words = raw["words"]
        unk_id = raw["unk_id"]
        self.unk_logp = (float(raw["uni_logp"][unk_id])
                         if unk_id is not None else -100.0)

        wh1 = np.zeros(len(words), np.int64)
        wh2 = np.zeros(len(words), np.int64)
        formable = np.zeros(len(words), bool)
        for wid, w in enumerate(words):
            if w in self.SPECIALS:
                continue
            ids = [label_map.char_to_int.get(ch) for ch in w]
            if any(i is None for i in ids):
                continue
            wh1[wid], wh2[wid] = _word_hash(ids)
            formable[wid] = True
        self.n_vocab = int(formable.sum())

        def pair_cols(id_rows: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
            keep = formable[id_rows].all(axis=1)
            rows = id_rows[keep]
            cols = np.empty((len(rows), 2 * rows.shape[1]), np.int64)
            cols[:, 0::2] = wh1[rows]
            cols[:, 1::2] = wh2[rows]
            return cols, keep

        self.tables = []
        uni_ids = np.arange(len(words), dtype=np.int64)[:, None]
        cols, keep = pair_cols(uni_ids)
        self.tables.append(_build_table(
            _fold_ids(cols, FOLD_A1, reserve_empty=True),
            _fold_ids(cols, FOLD_A2),
            raw["uni_logp"].astype(np.float32)[keep],
            raw["uni_backoff"].astype(np.float32)[keep]))
        for n in range(2, self.order + 1):
            cols, keep = pair_cols(raw["ids"][n].astype(np.int64))
            self.tables.append(_build_table(
                _fold_ids(cols, FOLD_A1, reserve_empty=True),
                _fold_ids(cols, FOLD_A2),
                raw["logp"][n].astype(np.float32)[keep],
                raw["backoff"][n].astype(np.float32)[keep]))

    def device(self) -> PackedLM:
        """Pack to device arrays in BUCKET-MAJOR layout: one table row =
        one whole bucket (BUCKET * 4 u32 = 64 bytes), so every probe is a
        single contiguous row gather. The slot-major (S, 4) layout cost 4
        gather rows per bucket window — measured 4x slower on TPU, whose
        gather cost scales with gathered ROW count, not bytes."""
        import numpy as _np

        import jax.numpy as jnp

        bases, off = [], 0
        for t in self.tables:
            bases.append(off)
            off += len(t.data) // BUCKET
        packed = jnp.asarray(_np.concatenate(
            [t.data.reshape(-1, BUCKET * 4) for t in self.tables], axis=0))
        return PackedLM(self.order, self.unk_logp,
                        packed, bases,
                        [t.mask for t in self.tables],
                        [t.depth for t in self.tables])


# ----------------------------------------------------------------------
# jittable queries (operate on a PackedLM of jnp arrays)
# ----------------------------------------------------------------------


def _bucket_slots(k1, k2, mask, base=0):
    """(...,) int32 BUCKET-row index of a key's one bucket (device tables
    are bucket-major: one bucket = one (BUCKET * 4)-u32 row, so a probe
    is ONE contiguous row gather). MUST mirror _mix_index bit-for-bit."""
    ia = _mix_index(k1, k2, mask)
    return ia.astype("int32") + base


def _bucket_rows(rows):
    """(..., BUCKET * 4) gathered bucket rows -> (..., BUCKET, 4)."""
    return rows.reshape(rows.shape[:-1] + (BUCKET, 4))


def jax_bitcast_f32(x):
    import jax

    return jax.lax.bitcast_convert_type(x, np.float32)


def _fold_pairs_jnp(pairs):
    """Fold a list of (h1, h2) uint32 word-identity pairs (oldest ->
    newest) into uint32 keys, mirroring the build's _fold_ids over
    interleaved pair columns. valid requires every pair's h1 to differ
    from the CTX_ABSENT sentinel."""
    import jax.numpy as jnp

    h1 = jnp.full(pairs[0][0].shape, FOLD_SEED, jnp.uint32)
    h2 = h1
    valid = jnp.ones(pairs[0][0].shape, bool)
    for a, b in pairs:
        for u in (a.astype(jnp.uint32) + 2, b.astype(jnp.uint32) + 2):
            h1 = h1 * FOLD_A1 + u
            h2 = h2 * FOLD_A2 + u
        valid &= a != CTX_ABSENT
    h1 = jnp.where(h1 == EMPTY_KEY, h1 ^ jnp.uint32(1), h1)
    return h1, h2, valid


def _probe_packed(lm: PackedLM, probes):
    """Run the step's n-gram probes as J SEPARATE one-row-per-key gathers.

    probes: list of (table_idx, k1, k2, valid) with a STATIC table index
    per probe; k1/k2/valid share a batch shape. Returns a list of
    (found, val0, val1) per probe.

    Layout history, all measured in-scan on v5e at the eval regime
    (B=64, W=128, J=3, ~13 MB table): a single stacked gather over
    (..., J) indices was built first on the model that TPU gathers pay a
    large fixed dispatch (so one gather beats J). That model is wrong at
    these shapes: the packed (..., J) gather plus its (..., J, BUCKET, 4)
    reshape consumer lowers to a 919 us/step loop, while J separate
    (...,)-indexed gathers, each consumed through its own
    (..., BUCKET, 4) reshape, cost 251 us/step TOTAL — Mosaic emits the
    fast contiguous-row path only for the rank-3 result. Keeping the
    strided consumer on the packed gather (no reshape) lands between
    (369 us). Hence: one gather per probe, reshape per probe."""
    import jax.numpy as jnp

    out = []
    for ti, k1, k2, valid in probes:
        slots = _bucket_slots(k1, k2, jnp.uint32(lm.masks[ti]),
                              lm.bases[ti])
        r = _bucket_rows(lm.ngrams[slots])         # (..., BUCKET, 4)
        hit = ((r[..., 0] == k1[..., None])
               & (r[..., 1] == k2[..., None]))
        found = hit.any(-1) & valid
        # at most one hit within the bucket (keys are unique per table):
        # a masked sum selects it without an argmax+gather
        pick = lambda v: jnp.sum(jnp.where(hit, v, 0.0), axis=-1)
        out.append((found, pick(jax_bitcast_f32(r[..., 2])),
                    pick(jax_bitcast_f32(r[..., 3]))))
    return out


def score_word_ln(lm: PackedLM, cur1, cur2, ctx, ctx_bos=None):
    """ln P(word | context) plus the word's canonical identity pair and
    (optionally) the backoff carries a beam should adopt if this word
    completes.

    cur1/cur2: rolling char hashes of the word (any batch shape);
    ctx: (..., order-1, 2) uint32 context word hash pairs, oldest ->
    newest (h1 == CTX_ABSENT where history is shorter). Mirrors
    ArpaLM._score. With ctx_bos carried, the whole query is ``order``
    independent one-row probes — there is no vocab lookup: the unigram
    probe's own hit flag is the in-vocab test (every LM word has a
    unigram entry), so nothing serializes ahead of any gather.

    ctx_bos: (..., order-1) float32 CARRIED context backoffs —
    ctx_bos[..., j] = backoff weight (log10; 0 when the entry is absent)
    of the length-(j+1) suffix of ``ctx``. A beam's context changes only
    at word completions, and the backoffs of the NEW context's suffixes
    (which all end in the completed word w) are exactly the backoff
    outputs of w's own full probes of orders 1..order-1 — so carrying
    them halves the per-step probe traffic: only the ``order`` full
    probes run each step, none of the context-backoff probes. When
    ctx_bos is None (host-side tests / one-shot scoring) the backoffs
    are probed explicitly.

    Returns (score_ln, pair, new_bos): ``pair`` (..., 2) is the word's
    canonical (h1-remapped) identity to append to ctx on commit;
    new_bos (..., order-1) are the carries for a beam that commits this
    word (new_bos[..., j] = backoff of (ctx[-(j):] + w), i.e. of the new
    context's length-(j+1) suffix)."""
    import jax.numpy as jnp

    cur1 = jnp.where(cur1 == EMPTY_KEY, cur1 ^ jnp.uint32(1), cur1)
    me = (cur1, cur2)
    probes = []                                    # table idx is static
    k1, k2, v = _fold_pairs_jnp([me])
    probes.append((0, k1, k2, v))
    for n in range(2, lm.order + 1):
        ctx_n = [(ctx[..., -(j + 1), 0], ctx[..., -(j + 1), 1])
                 for j in range(n - 2, -1, -1)]
        if ctx_bos is None:
            kc1, kc2, vc = _fold_pairs_jnp(ctx_n)  # backoff(context)
            probes.append((n - 2, kc1, kc2, vc))
        kf1, kf2, vf = _fold_pairs_jnp(ctx_n + [me])
        probes.append((n - 1, kf1, kf2, vf))
    res = _probe_packed(lm, probes)

    if ctx_bos is None:
        fulls = [res[0]] + [res[i + 1] for i in range(1, len(res), 2)]
        ctx_bo_vals = []
        for i in range(1, len(res), 2):
            cf, _, cb = res[i]
            ctx_bo_vals.append(jnp.where(cf, cb, 0.0))
    else:
        fulls = res
        ctx_bo_vals = [ctx_bos[..., j] for j in range(lm.order - 1)]

    f1, p1, _ = fulls[0]
    s = jnp.where(f1, p1, lm.unk_logp)
    for n in range(2, lm.order + 1):
        f, p, _ = fulls[n - 1]
        s = jnp.where(f, p, ctx_bo_vals[n - 2] + s)
    # backoff carries for the would-be new context (all suffixes end in
    # w): full probe of order j supplies suffix length j
    if lm.order > 1:
        new_bos = jnp.stack(
            [jnp.where(fulls[j][0], fulls[j][2], 0.0)
             for j in range(lm.order - 1)], axis=-1)
    else:
        new_bos = jnp.zeros(cur1.shape + (0,), jnp.float32)
    pair = jnp.stack([cur1, cur2], axis=-1)
    return s * LOG10_TO_LN, pair, new_bos
