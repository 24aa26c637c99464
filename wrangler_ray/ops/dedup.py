"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Shuffle shape (the part that matters at 100 TB):
- exact: content-hash inside ``map_batches`` (vectorized) → ONE groupby on the
  64-bit hash → keep min-id row per group. Shuffle volume = full data once,
  but grouped on a uniform hash → no skew.
- near-dup (MinHash/SimHash/embedding-LSH): signatures per batch (numpy) →
  explode to (bucket_key, doc_id) pairs — a FRACTION of the input bytes —
  → groupby(bucket) emits candidate edges → connected components. Candidate
  edges are ~O(#duplicates); we union-find them on the driver (documented
  assumption: duplicate clusters ≪ corpus; for adversarial corpora swap in
  the iterative min-label-propagation groupby loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HASH_SEED = 0x9E3779B97F4A7C15


def _content_hash(texts: np.ndarray) -> np.ndarray:
    """Stable 64-bit content hash per value (vectorized via pandas siphash)."""
    return pd.util.hash_array(texts.astype(object), categorize=False).astype(np.uint64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 128, method: str = "full"):
    """Keep exactly one row (min id) per distinct text value.

    hash-partition + per-group first — SURVEY §2.9. The shuffle key is a
    COARSE bucket of the 64-bit content hash (``num_buckets`` groups, uniform
    → skew-free) rather than the hash itself: one map_groups task per bucket
    with a vectorized pandas groupby inside, instead of one Python call per
    distinct value. num_buckets ≈ 4× cluster cores.

    ``method`` picks the exchange shape:
    - ``"full"`` (default): the rows themselves shuffle — collision-safe
      (texts compared by VALUE within a bucket) and one-pass, but the
      exchange moves the whole corpus once.
    - ``"hash_ids"``: only ``(hash128, id)`` rows shuffle (~24 B/doc —
      ~100× less exchange volume for long documents); the duplicate ids
      stay DISTRIBUTED as id-sorted object-store blocks (never concatenated
      on the driver — the driver holds only per-block [min,max] bounds),
      and survivors are kept by a map-side range-pruned sorted-run filter
      over the UNSHUFFLED input: each filter task fetches only the dropped-id
      blocks whose id range overlaps its batch. Texts are equated by a
      128-bit content hash (two independent 64-bit siphashes; null texts
      carry a sentinel fold so they can never collide with a real string),
      colliding with probability ~2⁻¹²⁸ — vanishing, but not value-compared.
      Pick this for long-document corpora where full-row exchange
      dominates."""
    if method == "hash_ids":
        return _exact_dedup_hash_ids(ds, text_col, id_col, num_buckets)
    if method != "full":
        raise ValueError(f"unknown exact_dedup method {method!r}")

    def add_bucket(t: pa.Table) -> pa.Table:
        # WITHIN-BLOCK COMBINER before the exchange: keep the min-id row per
        # distinct text inside this block (min is associative, texts compared
        # by VALUE — collision-safe like keep_first), so the shuffle ships
        # only each block's distinct texts. On a crawl-like corpus the
        # exchange volume drops by the block's internal dup fraction for
        # free; on an all-unique block this is one vectorized groupby pass.
        if t.num_rows:
            df = t.to_pandas()
            keep = df.groupby(text_col, sort=False, dropna=False)[id_col].idxmin()
            if len(keep) < len(df):
                t = pa.Table.from_pandas(
                    df.loc[np.sort(keep.to_numpy())], preserve_index=False
                )
        h = _content_hash(t.column(text_col).to_numpy(zero_copy_only=False))
        # metadata stripped: parquet files written by pandas carry a dict
        # that makes the schema unhashable — every shuffle reduce over such
        # blocks trips Ray's "Failed to hash the schemas" warning
        return t.replace_schema_metadata(None).append_column(
            "_b", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def keep_first(g: pa.Table) -> pa.Table:
        # within one coarse bucket: min id per distinct text (collision-safe);
        # dropna=False so null-text rows keep one representative (pandas
        # drops NaN groups by default — that silently deleted every null-text
        # row from the dedup output); pyarrow in/out (pandas map_groups
        # output path is slow in Ray 2.49)
        df = g.to_pandas()
        idx = df.groupby(text_col, sort=False, dropna=False)[id_col].idxmin()
        # metadata stripped: from_pandas attaches a pandas dict that makes
        # the schema UNHASHABLE, so every such block trips Ray's
        # "Failed to hash the schemas" warning and defeats its schema dedup
        return pa.Table.from_pandas(
            df.loc[idx], preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(keep_first, batch_format="pyarrow")
        .drop_columns(["_b"])
    )


# sentinel folded into h2 for NULL texts: pd.util.hash_array stringifies
# None, so without it a null-text row collides with a row whose text is the
# literal string "None" and one of the two is wrongly dropped (ADVICE r4).
# All nulls share the sentinel → they group together (one representative),
# matching method="full"'s dropna=False semantics.
_NULL_H2_SENTINEL = np.uint64(0xA5A5_5A5A_DEAD_BEEF)

# per-process cache of fetched dropped-id blocks (ref hex → sorted ndarray),
# bounded by total cached elements so a long-lived filter actor can't hoard
# every dropped-id block of a 10^10-row corpus
_DROP_BLOCK_CACHE: dict = {}
_DROP_CACHE_MAX_ELEMS = 50_000_000


def _exact_dedup_hash_ids(ds, text_col: str, id_col: str, num_buckets: int):
    """Exchange-light exact dedup (see exact_dedup method="hash_ids"):
    shuffle (h1, h2, id) only, reduce each bucket to its DROPPED ids (all but
    the min id per distinct 128-bit hash), then filter the original dataset
    map-side through a DISTRIBUTED sorted-run filter: the dropped ids are
    sorted into range-partitioned object-store blocks, the driver keeps only
    per-block [min,max] bounds (16 B/block), and each filter task fetches
    just the blocks overlapping its batch's id range (per-process LRU-ish
    cache). The text bytes never enter an exchange and the dropped-id set is
    never concatenated on the driver."""
    import ray

    def hash_rows(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        texts = col.to_numpy(zero_copy_only=False).astype(object)
        h1 = pd.util.hash_array(texts, categorize=False).astype(np.uint64)
        h2 = pd.util.hash_array(
            texts, categorize=False, hash_key="wrangler_ray_2nd"
        ).astype(np.uint64)
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        if nulls.any():
            h2 = h2.copy()
            h2[nulls] ^= _NULL_H2_SENTINEL
        return pa.table(
            {
                "_b": pa.array((h1 % np.uint64(num_buckets)).astype(np.int32)),
                "h1": pa.array(h1.astype(np.int64)),
                "h2": pa.array(h2.astype(np.int64)),
                id_col: t.column(id_col),
            }
        )

    def dropped_ids(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        keep = df.groupby(["h1", "h2"], sort=False)[id_col].idxmin()
        return pa.table(
            {id_col: pa.array(df[id_col].drop(index=keep).to_numpy())}
        )

    # dropped ids, id-sorted → range-partitioned blocks in the OBJECT STORE;
    # the block refs (driver-held in `live` below, captured by the filter
    # closure) keep them alive for the pipeline's life
    dropped = (
        ds.select_columns([id_col, text_col])
        .map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(dropped_ids, batch_format="pyarrow")
        .sort(id_col)
        .materialize()
    )
    block_refs = list(dropped.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _bounds(t: pa.Table):
        # an all-empty sort can emit a block with a degenerate schema
        if t.num_rows == 0 or id_col not in t.column_names:
            return None
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return (ids[0], ids[-1])  # sorted blocks → first/last are min/max

    bounds = ray.get([_bounds.remote(r) for r in block_refs])
    live = [(b[0], b[1], r) for b, r in zip(bounds, block_refs) if b is not None]
    if not live:
        return ds  # nothing dropped — corpus already exact-unique

    def _fetch_block(ref) -> np.ndarray:
        key = ref.hex()
        arr = _DROP_BLOCK_CACHE.get(key)
        if arr is None:
            arr = (
                ray.get(ref).column(id_col).to_numpy(zero_copy_only=False)
            )
            if (
                sum(len(v) for v in _DROP_BLOCK_CACHE.values()) + len(arr)
                > _DROP_CACHE_MAX_ELEMS
            ):
                _DROP_BLOCK_CACHE.clear()
            _DROP_BLOCK_CACHE[key] = arr
        return arr

    # `live` (driver-held ObjectRef list, captured in this closure) keeps the
    # dropped-id blocks alive via the driver's reference counting for the
    # returned pipeline's lifetime — no need to pin the dataset handle
    def remove(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t
        lo, hi = ids.min(), ids.max()
        mask = np.zeros(len(ids), bool)
        for blo, bhi, ref in live:
            if bhi < lo or blo > hi:  # range-pruned: block can't match
                continue
            mask |= np.isin(ids, _fetch_block(ref))
        return t.filter(pa.array(~mask))

    return ds.map_batches(remove, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------

_FNV = np.uint64(1099511628211)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3-style finalizer (bit spread), vectorized, wraps mod 2^64."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character-k-shingle 64-bit hashes, fully vectorized: sliding windows
    over the utf-8 bytes dotted with FNV-prime powers (mod 2^64), then a
    murmur finalizer. Deterministic across processes."""
    if text is None:
        return np.empty(0, np.uint64)
    s = " ".join(text.split()).lower()
    if len(s) < k:
        s = s.ljust(k)
    codes = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(codes) < k:
        codes = np.pad(codes, (0, k - len(codes)), constant_values=32)
    powers = np.empty(k, np.uint64)
    powers[0] = 1
    n_win = len(codes) - k + 1
    h = np.zeros(n_win, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(1, k):
            powers[i] = powers[i - 1] * _FNV  # wraps mod 2^64
        # shifted-add form: k 1-D passes, no (n_win × k) temp
        for j in range(k):
            h += codes[j : j + n_win] * powers[j]
    return _mix64(h)


def _sign_texts(
    texts: list, a: np.ndarray, b: np.ndarray, shingle_k: int, num_perm: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch MinHash signing: one flattened shingle-hash pass over ALL docs
    plus per-permutation ``np.minimum.reduceat`` segment mins — the per-doc
    Python/numpy-call overhead of looping ``signature()`` removed from the
    hottest dedup stage (VERDICT r4 #3). Byte-identical to the per-doc path
    (pinned by tests/test_advice_r5.py): the sliding-window hash of each doc
    is a contiguous slice of the concatenated window hash, and reduceat's
    per-segment min equals the per-doc min.

    Returns ``(sigs, digs)``: ``sigs[i]`` is UINT64_MAX for null texts
    (no shingles), ``digs[i]`` the re-mixed XOR of the doc's DISTINCT
    shingle hashes (0 for null texts)."""
    n = len(texts)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, np.uint64)
    digs = np.zeros(n, np.uint64)
    # string prep stays per-doc (must match str.split()'s unicode whitespace
    # semantics exactly); all numeric work below is batched per cache chunk
    codes_list, valid = [], []
    k = shingle_k
    for i, x in enumerate(texts):
        if x is None:
            continue
        s = " ".join(x.split()).lower()
        if len(s) < k:
            s = s.ljust(k)
        c = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if len(c) < k:
            c = np.pad(c, (0, k - len(c)), constant_values=32)
        codes_list.append(c)
        valid.append(i)
    if not codes_list:
        return sigs, digs
    vi = np.asarray(valid)
    powers = np.empty(k, np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):
        for j in range(1, k):
            powers[j] = powers[j - 1] * _FNV  # wraps mod 2^64
    # chunk docs so one chunk's shingle hashes (~CHUNK × 8 B) stay L2-resident
    # through the 64 permutation passes: one global pass is memory-bandwidth
    # bound (measured 2-4× slower), one doc per pass is interpreter-bound
    CHUNK = 1 << 16
    lens_all = np.array([len(c) for c in codes_list], np.int64)
    dig_out = np.empty(len(vi), np.uint64)
    sig_out = np.empty((len(vi), num_perm), np.uint64)
    lo = 0
    while lo < len(codes_list):
        hi = lo + 1
        tot = lens_all[lo]
        while hi < len(codes_list) and tot + lens_all[hi] <= CHUNK:
            tot += lens_all[hi]
            hi += 1
        lens = lens_all[lo:hi]
        C = np.concatenate(codes_list[lo:hi]).astype(np.uint64)
        nw_all = len(C) - k + 1
        with np.errstate(over="ignore"):
            H = np.zeros(nw_all, np.uint64)
            for j in range(k):
                H += C[j : j + nw_all] * powers[j]
        H = _mix64(H)
        w = lens - k + 1  # windows per doc (padding guarantees >= 1)
        offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
        wstart = np.concatenate(([0], np.cumsum(w)))[:-1]
        # window j of doc i sits at offsets[i] + (j - wstart[i]) in H:
        # windows crossing doc boundaries are skipped by construction
        idx = np.arange(int(w.sum())) + np.repeat(offsets - wstart, w)
        sh = H[idx]
        # SET digest per doc: XOR of DISTINCT shingle hashes, re-mixed
        # (np.unique per small slice beats a segmented lexsort by ~10×)
        ends = wstart + w
        for d in range(len(w)):
            dig_out[lo + d] = np.bitwise_xor.reduce(
                np.unique(sh[wstart[d] : ends[d]])
            )
        with np.errstate(over="ignore"):
            # one 1-D pass per permutation: 2-D reduceat(axis=1) is ~15×
            # slower in numpy (segment dispatch on the non-contiguous axis)
            for p in range(num_perm):
                sig_out[lo:hi, p] = np.minimum.reduceat(
                    sh * a[p] + b[p], wstart
                )
        lo = hi
    digs[vi] = _mix64(dig_out)
    sigs[vi] = sig_out
    return sigs, digs


class MinHasher:
    """num_perm hash "permutations" h_i(x) = (a_i*x + b_i) wrapping mod 2^64
    with odd a_i. Dropping the mod-Mersenne-prime reduction makes signing
    ~1.8× faster (measured); the min over shingles is decided by the HIGH
    bits of a_i*x, which are well mixed for odd multipliers over the already
    murmur-finalized shingle hashes. Stateful (parameter matrix built once)
    → used as an actor-pool stage."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 1):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 62, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        # (num_perm, n_shingles) via broadcasting, min over shingles
        with np.errstate(over="ignore"):
            prod = sh[None, :] * self.a[:, None] + self.b[:, None]
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist() if "text" in batch.column_names else []
        sigs, _ = _sign_texts(texts, self.a, self.b, self.shingle_k, self.num_perm)
        return batch.append_column(
            "_minhash", pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64()))
        )


def _group_all_pairs(df: pd.DataFrame, key_cols: list, id_col: str,
                     cap: int = 256) -> tuple:
    """All candidate pairs (a<b) within each key group, vectorized by group
    SIZE class (one triu expansion per distinct size — no per-row loop).
    Returns ``(a, b, fb)`` where ``fb=1`` marks fallback STAR edges from
    groups larger than ``cap``: those groups fall back to star+chain edges
    (2g-3 instead of g²/2), which silently disconnects true pairs whenever a
    star/chain edge fails downstream verification — so callers whose
    verification is remote use the fb flag to RE-PAIR failed star members
    (one repair round), and every activation is counted in
    ``FALLBACK_METRICS`` and logged so recall loss is observable."""
    if not len(df):
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.int8)
    df = df.sort_values(key_cols + [id_col], kind="mergesort")
    gid = df.groupby(key_cols, sort=False).ngroup().to_numpy()
    ids = df[id_col].to_numpy()
    counts = np.bincount(gid)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out_a, out_b, out_fb = [], [], []
    sizes = np.unique(counts)
    for s in sizes[(sizes >= 2) & (sizes <= cap)]:
        gsel = np.nonzero(counts == s)[0]
        idx = offsets[gsel][:, None] + np.arange(s)[None, :]
        m = ids[idx]  # (n_groups, s), ids ascending within each row
        iu, ju = np.triu_indices(s, k=1)
        out_a.append(m[:, iu].ravel())
        out_b.append(m[:, ju].ravel())
        out_fb.append(np.zeros(len(gsel) * len(iu), np.int8))
    oversized = np.nonzero(counts > cap)[0]
    if len(oversized):
        import logging

        FALLBACK_METRICS["oversized_groups"] += len(oversized)
        FALLBACK_METRICS["max_group_size"] = max(
            FALLBACK_METRICS["max_group_size"], int(counts[oversized].max())
        )
        logging.getLogger(__name__).warning(
            "dedup pairing: %d group(s) exceed the all-pairs cap (%d); "
            "largest=%d — star+chain fallback engaged (repair round will "
            "re-pair members whose star edge fails verification)",
            len(oversized), cap, int(counts[oversized].max()),
        )
    for gi in oversized:
        members = ids[offsets[gi] : offsets[gi + 1]]
        # star edges (hub = min id) carry fb=1 so failed ones can be re-paired
        out_a.append(np.full(len(members) - 1, members[0]))
        out_b.append(members[1:])
        out_fb.append(np.ones(len(members) - 1, np.int8))
        # chain edges are ordinary candidates (fb=0)
        out_a.append(members[1:-1])
        out_b.append(members[2:])
        out_fb.append(np.zeros(max(len(members) - 2, 0), np.int8))
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.int8)
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_fb)


# per-process observability counters for the oversized-group fallback (worker
# logs surface activations; tests read them directly)
FALLBACK_METRICS = {"oversized_groups": 0, "max_group_size": 0}

# coarse shuffle-bucket count shared by the LSH banding shuffle and the
# persisted-index read path (both must derive the SAME _bkt from a band row)
NUM_COARSE_BUCKETS = 64


def _coarse_bucket(keys_i64: np.ndarray, bands_i32: np.ndarray) -> np.ndarray:
    """The coarse shuffle bucket of a band row, derived from its (key, band)
    — identical for rows banded in-flight and rows read back from a
    persisted band-partitioned index."""
    return (
        (keys_i64.astype(np.uint64) ^ (bands_i32.astype(np.uint64) << np.uint64(56)))
        % np.uint64(NUM_COARSE_BUCKETS)
    ).astype(np.int32)


def _collect_band_keys(banded, parts: int, max_keys: int):
    """Driver-side collection of the increment's distinct band keys: returns
    ``(pbs, keys)`` where ``pbs`` is the distinct persisted-partition set
    (``key % parts`` — at most ``parts`` values, always tiny) and ``keys`` is
    the exact distinct-key array for filter pushdown, or None when it exceeds
    ``max_keys`` (partition-level pruning only). Streams the key column —
    never the full band table."""
    chunks: list = []
    pbs = np.empty(0, np.int64)
    too_many = False
    for t in banded.select_columns(["key"]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        k = np.unique(t.column("key").to_numpy(zero_copy_only=False))
        pbs = np.union1d(pbs, k % parts)
        if not too_many:
            chunks.append(k)
            if sum(len(c) for c in chunks) > max_keys:
                too_many = True
                chunks = []
    keys = None if too_many else (
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    )
    return pbs.astype(np.int64), keys


def _repair_pairs(hubs: np.ndarray, members: np.ndarray, cap: int = 256) -> tuple:
    """One repair round for fallback stars where ≥1 edge failed verification:
    for each hub, all-pairs among its star members in chunks of ``cap``
    (bounded edges), plus all-pairs among the chunk leads so chunks stay
    connected through their leads. Callers pass ALL star members of each
    affected hub (passed AND failed) — a failed member's true duplicate may
    be a member whose own star edge passed (J(hub,m1)≥t, J(hub,m2)<t,
    J(m1,m2)≥t), so pairing only the failed members misses it. The hub
    itself is NOT re-paired: its edges to every member were already verified,
    so re-pairing it adds zero recall while pushing members across chunk
    boundaries. Returns (a, b) candidate arrays."""
    out_a, out_b = [], []
    df = pd.DataFrame({"h": hubs, "m": members})
    for _h, grp in df.groupby("h", sort=False):
        F = np.unique(grp["m"].to_numpy())
        if len(F) < 2:
            continue
        leads = []
        for start in range(0, len(F), cap):
            chunk = F[start : start + cap]
            leads.append(chunk[0])
            if len(chunk) >= 2:
                iu, ju = np.triu_indices(len(chunk), k=1)
                out_a.append(chunk[iu])
                out_b.append(chunk[ju])
        if len(leads) >= 2:
            la = np.asarray(leads[:cap])
            iu, ju = np.triu_indices(len(la), k=1)
            out_a.append(la[iu])
            out_b.append(la[ju])
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(out_a).astype(np.int64), np.concatenate(out_b).astype(np.int64)


def _repair_candidates(a_ids: np.ndarray, b_ids: np.ndarray,
                       fb_mask: np.ndarray, accepted: np.ndarray,
                       cap: int = 256) -> tuple:
    """Repair-pair generation shared by the minhash/simhash verification
    tails: for every hub whose fallback star lost ≥1 edge, re-pair ALL its
    star members — the passed ones included, because a failed member's true
    duplicate may be a member whose own star edge passed. Returns (a, b)
    candidate arrays (empty when no fb edge failed)."""
    fb_fail = fb_mask & ~accepted
    if not fb_fail.any():
        z = np.empty(0, np.int64)
        return z, z
    bad_hubs = np.unique(a_ids[fb_fail])
    sel = fb_mask & np.isin(a_ids, bad_hubs)
    return _repair_pairs(a_ids[sel], b_ids[sel], cap=cap)


def _dedupe_pairs_df(df: pd.DataFrame) -> pd.DataFrame:
    """Deduplicate an (a, b[, ch][, fb]) edge frame; a pair flagged as a chain
    edge (ch=1: guaranteed-duplicate, skips verification) or as a fallback
    star edge (fb=1: re-paired if verification fails) in ANY bucket keeps the
    flag."""
    flags = [c for c in ("ch", "fb") if c in df.columns]
    if flags:
        # keep the max flag per pair WITHOUT a groupby: stable-sort flagged
        # rows first, then hash-based drop_duplicates keeps them (measured
        # several times faster than groupby(["a","b"]).max on millions of
        # edges)
        return (
            df.sort_values(flags, ascending=False, kind="stable")
            .drop_duplicates(["a", "b"], ignore_index=True)
        )
    return df.drop_duplicates(ignore_index=True)


def _collect_edges(ds_pairs) -> pd.DataFrame:
    """Collect candidate edges on the driver as a deduplicated (a, b[, ch])
    frame (caller has already checked |edges| fits driver memory). Arrow-batch
    collection + vectorized dedupe — never per-row dict iteration."""
    tabs = list(ds_pairs.iter_batches(batch_size=None, batch_format="pyarrow"))
    t = pa.concat_tables([t for t in tabs if t.num_rows]) if tabs else None
    if t is None or t.num_rows == 0:
        return pd.DataFrame({"a": [], "b": []})
    return _dedupe_pairs_df(t.to_pandas())


def _distinct_pairs(pairs):
    """Global DISTINCT over (a, b) edge rows via a bucketed exchange — the
    same pair surfaces from up to `bands` different LSH buckets, so the raw
    edge stream overcounts real candidates by up to that factor. 16 bytes per
    row, vectorized drop_duplicates per bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "_pb": pa.array([], pa.int32())})
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
        return t.append_column("_pb", pa.array((h % 64).astype(np.int32)))

    def dedupe(g: pa.Table) -> pa.Table:
        df = _dedupe_pairs_df(g.drop_columns(["_pb"]).to_pandas())
        cols = {"a": pa.array(df["a"].to_numpy(np.int64)),
                "b": pa.array(df["b"].to_numpy(np.int64))}
        for fl in ("ch", "fb"):
            if fl in df.columns:
                cols[fl] = pa.array(df[fl].to_numpy(np.int8))
        return pa.table(cols)

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(dedupe, batch_format="pyarrow")
    )


def _edges_or_distributed(pairs, max_driver_edges: int):
    """Materialize the candidate-edge dataset and decide the clustering route:
    returns (pairs_mat, edges_df) when the edge count fits the driver
    (union-find path), or (pairs_mat, None) to auto-route to the distributed
    label-propagation path — a 100 TB crawl corpus blows past any driver cap
    on the first run, so this must never raise. The count is free metadata
    after materialize(). A raw count over the cap is first re-counted after a
    global pair-DISTINCT (the same pair arrives from up to `bands` buckets);
    only a cap-exceeding DISTINCT edge set goes distributed."""
    mat = pairs.materialize()
    if mat.count() > max_driver_edges:
        mat = _distinct_pairs(mat).materialize()
        if mat.count() > max_driver_edges:
            return mat, None
    return mat, _collect_edges(mat)


def _cc_drop(ds, pairs, id_col):
    """Distributed tail shared by the dedup variants whose edges are already
    fully verified: min-label-propagation components + representative join
    (ops.cc) — no driver-resident edge set."""
    from wrangler_ray.ops.cc import connected_components, drop_non_representatives

    labels = connected_components(pairs.materialize())
    return drop_non_representatives(ds, labels, id_col=id_col)


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
    exact_margin: float = 0.12,
    distributed: bool = False,
    max_driver_edges: int = 4_000_000,
    pair_cap: int = 256,
    pre_exact=True,  # True | False | "hash_ids"
    indexed=None,
    return_artifacts: bool = False,
    max_broadcast_keys: int = 4_000_000,
):
    """MinHash+LSH near-dup removal: shingle→minhash→band→bucket groupby→
    candidate pairs→verify Jaccard→connected components→keep min-id per
    cluster. Returns the deduplicated Dataset.

    ``pre_exact`` first collapses byte-identical texts with the cheap
    exact_dedup pass (keep min id per distinct text); pass the string
    ``"hash_ids"`` to run that pre-pass through the exchange-light method
    (only (hash128, id) rows shuffle — see exact_dedup) for long-document
    corpora where the pre-pass full-row exchange would dominate. This is
    semantics-preserving — identical texts have identical shingle sets, so
    Jaccard
    1.0 ≥ any threshold and every copy always lands in its original's
    cluster with the group minimum id — but on dup-heavy corpora (crawl
    data) it shrinks signature work linearly and candidate-edge volume
    quadratically before the expensive stages run.

    Verification is two-tier so dup-heavy corpora (crawl data) stay cheap:
    every candidate edge is scored with the vectorized MinHash Jaccard
    ESTIMATE (mean of matching signature components — one numpy comparison
    over all edges at once, signatures only, ~num_perm·8 bytes per doc on the
    driver); only edges within ``±exact_margin`` of the threshold fall back
    to TRUE shingle-set Jaccard, for which only those few texts are fetched.

    ``indexed`` unions an already-deduped historical corpus into the
    candidate space without re-signing it. Two protocols:

    - legacy tuple ``(texts_ds, signed_ds)``: ``signed_ds`` rows are
      (id, sig, dig) produced by a previous run with the same (num_perm,
      bands, shingle_k); ``texts_ds`` provides (id, text) for borderline
      exact verification only — either a Dataset, or a
      callable(candidate_ids) -> Dataset so the caller can push the id
      filter into the parquet read (row-group pruning). The FULL historical
      signature table is read and re-banded — O(index) per call.
    - banded-index object (duck-typed on ``banded_for``): exposes
      ``sig_parts`` (int), ``watermark`` (max indexed id),
      ``banded_for(pbs, keys)`` → Dataset of PRE-BANDED historical rows
      (_bkt, band, key, id, dig) pruned to the partitions/keys the increment
      actually hashes to, ``sigs_for(ids | None)`` → (id, sig, dig) rows
      for exactly those ids (None = all), and ``texts_for(ids)``. Historical
      signatures are then read only for candidate-edge endpoints and
      historical band rows only from matching partitions — O(increment)
      work per call, not O(index). Candidate pairs whose BOTH endpoints are
      historical (b ≤ watermark) are dropped: they were resolved when those
      docs were indexed.

    Incoming ids must exceed every indexed id so cluster minima always land
    on the indexed side ("old doc wins") — enforced by MinHashDedupIndex,
    the intended caller. The returned Dataset filters ``ds`` only, so
    indexed docs never reappear in the output.

    ``return_artifacts=True`` returns ``(result, signed, banded)`` where
    ``signed``/``banded`` are the materialized signature and band-row tables
    of THIS call's input docs — so an index appending the survivors persists
    them by filtering instead of re-signing.

    ``distributed=True`` switches to the no-driver-state path for corpora
    whose candidate-edge set exceeds driver memory: edges stay a Dataset,
    verification is a double hash-join against the signature table with the
    same MinHash estimate (estimate-only — no exact-borderline pass), and
    clustering + drop run via wrangler_ray.ops.cc (min-label-propagation
    connected components + representative join). Same semantics up to the
    borderline estimate band."""
    assert num_perm % bands == 0
    if pre_exact:
        # materialized: the deduped result is consumed up to three times
        # (signing, borderline text fetch, final survivor filter) — left
        # lazy, each consumption re-executes the full exact-dedup exchange.
        # pre_exact="hash_ids" routes the pre-pass through the exchange-light
        # exact_dedup (only (hash128, id) rows shuffle — the full-row
        # exchange IS the corpus-size exchange at 100 TB)
        method = pre_exact if isinstance(pre_exact, str) else "full"
        ds = exact_dedup(
            ds, text_col=text_col, id_col=id_col, method=method
        ).materialize()
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm=num_perm, shingle_k=shingle_k)

    num_buckets = NUM_COARSE_BUCKETS  # coarse shuffle groups: few enough that
    # one group task clears the ~15-45ms/task executor overhead (see
    # BASELINE.md task-sizing); shared constant so persisted band rows land in
    # the same buckets when read back

    def sign(t: pa.Table) -> pa.Table:
        # batched signer (one flattened pass; see _sign_texts). The SET
        # digest (XOR of distinct shingle hashes, re-mixed) satisfies:
        # identical digest ⇔ identical shingle SET (up to a 2^-64 collision)
        # ⇒ true Jaccard 1.0 — the property the digest reduction in
        # bucket_edges relies on for BOTH verification tiers
        texts = t.column(text_col).to_pylist()
        sigs, digs = _sign_texts(
            texts, hasher.a, hasher.b, shingle_k, num_perm
        )
        return pa.table(
            {
                id_col: t.column(id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.astype(np.int64).ravel(), pa.int64()), num_perm
                ),
                "dig": pa.array(digs.astype(np.int64), pa.int64()),
            }
        )

    banded_index = indexed is not None and hasattr(indexed, "banded_for")
    # signatures computed ONCE, kept distributed; band keys derive from them
    signed = ds.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # text_source is only consumed for BORDERLINE exact verification; it is a
    # zero-arg Dataset or a callable(ids)->Dataset — a callable lets the
    # caller push the candidate-id filter into the parquet read (row-group
    # stats pruning) instead of scanning every historical text block
    text_source = lambda _ids: ds  # noqa: E731
    hist_sigs_for = None  # banded-index protocol: (ids|None) -> (id,sig,dig)
    watermark = None
    if banded_index:
        watermark = indexed.watermark
        hist_sigs_for = indexed.sigs_for
        text_source = lambda ids: ds.select_columns(  # noqa: E731
            [id_col, text_col]
        ).union(indexed.texts_for(ids))
    elif indexed is not None:
        idx_texts, idx_signed = indexed
        signed = signed.union(idx_signed)
        if callable(idx_texts):
            text_source = lambda ids: ds.select_columns(  # noqa: E731
                [id_col, text_col]
            ).union(idx_texts(ids))
        else:
            _union = ds.select_columns([id_col, text_col]).union(
                idx_texts.select_columns([id_col, text_col])
            )
            text_source = lambda _ids: _union  # noqa: E731

    def band_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"_bkt": pa.array([], pa.int32()), "band": pa.array([], pa.int32()),
                 "key": pa.array([], pa.int64()),
                 id_col: pa.array([], t.column(id_col).type),
                 "dig": pa.array([], pa.int64())}
            )
        sigs = (
            t.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.uint64).reshape(n, num_perm)
        )
        ids = t.column(id_col)
        # shingle-SET digest (computed in sign): members of a bucket with the
        # same digest have true Jaccard 1.0; bucket_edges emits star edges
        # within a digest group and all-pairs only ACROSS digests
        digs = t.column("dig")
        # band keys fully vectorized: fold the band's minhash components with
        # a murmur-mixed multiply-accumulate (no per-row hashlib calls —
        # bands × n blake2b invocations dominated this stage)
        K = np.uint64(0x9E3779B97F4A7C15)
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        keys = np.empty(bands * n, np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
                acc = np.full(n, np.uint64(b + 1), np.uint64)
                for c in range(chunk.shape[1]):
                    acc = _mix64(acc * K ^ chunk[:, c])
                keys[b * n : (b + 1) * n] = acc >> np.uint64(1)
        bkt = _coarse_bucket(keys.astype(np.int64), out_band)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "_bkt": pa.array(bkt),
                "band": pa.array(out_band),
                "key": pa.array(keys.astype(np.int64), pa.int64()),
                id_col: ids.take(idx),
                "dig": digs.take(idx),
            }
        )

    def _digest_pairs(df: pd.DataFrame):  # noqa: D401 — closes over pair_cap
        """Candidate pairs for one coarse bucket with shingle-set-digest
        reduction. Within a (band,key) LSH bucket:
        - identical-digest members (identical shingle SETS → true Jaccard
          1.0 → identical signatures too) chain: consecutive ids, g-1 edges
          instead of g²/2 — chain edges pass BOTH verification tiers by
          construction;
        - DISTINCT digests pair all-vs-all via their min-id representatives
          (set-identical members are interchangeable for any partner, so one
          representative decides for the group)."""
        df = df.sort_values(["band", "key", "dig", id_col], kind="mergesort")
        ids = df[id_col].to_numpy()
        band = df["band"].to_numpy()
        key = df["key"].to_numpy()
        dig = df["dig"].to_numpy()
        same_bucket = np.zeros(len(df), bool)
        same_bucket[1:] = (band[1:] == band[:-1]) & (key[1:] == key[:-1])
        same_dig = same_bucket.copy()
        same_dig[1:] &= dig[1:] == dig[:-1]
        # STAR edges inside each digest group (hub = the group's first/min
        # id): g-1 edges like a chain, but graph diameter stays 2 so the
        # distributed min-label propagation converges in ~3 shuffle rounds
        # (a chain of g duplicates needs g rounds). A star hub is safe HERE
        # because same-digest edges are duplicates by construction and skip
        # verification — the hub can never be rejected.
        group_first = np.cumsum(~same_dig) - 1  # index into the firsts array
        firsts = ids[~same_dig]
        member_rows = same_dig
        star_a = firsts[group_first[member_rows]]
        star_b = ids[member_rows]
        # representatives: first row of each (band,key,dig) group
        reps = df[~same_dig]
        rep_a, rep_b, rep_fb = _group_all_pairs(reps, ["band", "key"], id_col,
                                                cap=pair_cap)
        # ch=1 marks same-digest edges: identical shingle sets ⇒ true
        # Jaccard 1.0 ⇒ accepted at any threshold WITHOUT verification;
        # fb=1 marks fallback star edges from oversized rep groups — if one
        # fails verification its members are RE-PAIRED in a repair round
        ch = np.concatenate(
            [np.ones(len(star_a), np.int8), np.zeros(len(rep_a), np.int8)]
        )
        fb = np.concatenate([np.zeros(len(star_a), np.int8), rep_fb])
        return (np.concatenate([star_a, rep_a]),
                np.concatenate([star_b, rep_b]), ch, fb)

    def bucket_edges(g: pa.Table) -> pa.Table:
        # one coarse bucket holds MANY (band,key) LSH buckets → vectorized
        # pandas/numpy inside; pyarrow in/out (the pandas OUTPUT path of
        # map_groups is pathologically slow in Ray 2.49 — measured 46s vs 1s).
        # ALL pairs within an LSH bucket are candidates (star-edges to the
        # group min would silently drop real pairs whenever the min is a
        # false-positive collision that fails downstream verification), with
        # the signature-digest reduction collapsing identical-signature
        # members to chains + one representative.
        df = g.to_pandas()
        a_np, b_np, ch, fb = _digest_pairs(df)
        out = _dedupe_pairs_df(
            pd.DataFrame({"a": a_np, "b": b_np, "ch": ch, "fb": fb})
        )
        return pa.table({"a": pa.array(out["a"]), "b": pa.array(out["b"]),
                         "ch": pa.array(out["ch"].astype(np.int8)),
                         "fb": pa.array(out["fb"].astype(np.int8))})

    banded = signed.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
    if banded_index or return_artifacts:
        banded = banded.materialize()
    banded_own = banded  # THIS call's band rows only (the persistable artifact)
    if banded_index:
        # prune the historical read to the band partitions (and, when small
        # enough to broadcast, the exact keys) this increment hashes to —
        # O(increment) historical I/O instead of re-reading the whole index
        pbs, keys = _collect_band_keys(
            banded_own, indexed.sig_parts, max_broadcast_keys
        )
        banded = banded_own.union(indexed.banded_for(pbs, keys))
    pairs = banded.groupby("_bkt").map_groups(bucket_edges, batch_format="pyarrow")
    if banded_index:
        w = watermark

        def drop_hist_hist(t: pa.Table) -> pa.Table:
            # a<b on every emitted pair, so b ≤ watermark ⇔ both endpoints
            # are historical — already resolved when they were indexed
            if t.num_rows == 0 or "b" not in t.column_names:
                return t
            bb = t.column("b").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(bb > w))

        pairs = pairs.map_batches(
            drop_hist_hist, batch_format="pyarrow", zero_copy_batch=True
        )

    def _finish(result):
        return (result, signed, banded_own) if return_artifacts else result

    def _signed_full():
        # the distributed tail attaches signatures by id with no driver-side
        # candidate set to prune on — union the persisted table (banded-index
        # protocol only; the legacy tuple already unioned it into `signed`)
        return signed.union(hist_sigs_for(None)) if banded_index else signed

    if distributed:
        return _finish(_distributed_dedup_finish(
            ds, _signed_full(), pairs, id_col, num_perm, jaccard_threshold,
            pair_cap
        ))

    pairs, edges = _edges_or_distributed(pairs, max_driver_edges)
    if edges is None:  # edge set too large for driver union-find — auto-switch
        return _finish(_distributed_dedup_finish(
            ds, _signed_full(), pairs, id_col, num_perm, jaccard_threshold,
            pair_cap
        ))

    if len(edges):
        a_ids = edges["a"].to_numpy()
        b_ids = edges["b"].to_numpy()
        chain_mask = (
            edges["ch"].to_numpy().astype(bool)
            if "ch" in edges.columns
            else np.zeros(len(a_ids), bool)
        )
        fb_mask = (
            edges["fb"].to_numpy().astype(bool)
            if "fb" in edges.columns
            else np.zeros(len(a_ids), bool)
        )
        cand = np.unique(np.concatenate([a_ids, b_ids]))

        # fetch candidate SIGNATURES (num_perm·8 bytes each, not texts),
        # vectorized membership + matrix gather
        def collect_sigs(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, cand)))

        sig_scan = signed
        if banded_index:
            # historical endpoints' signatures: an id-filtered read of the
            # persisted table (row-group pruning), not a full-index scan
            old = cand[cand <= watermark]
            if len(old):
                sig_scan = signed.union(hist_sigs_for(old))
        sig_tabs = list(
            sig_scan.map_batches(
                collect_sigs, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        sig_t = pa.concat_tables([t for t in sig_tabs if t.num_rows])
        sig_ids = sig_t.column(id_col).to_numpy(zero_copy_only=False)
        mat = (
            sig_t.column("sig").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(len(sig_ids), num_perm)
        )
        order = np.argsort(sig_ids)
        sorted_ids = sig_ids[order]

        def _verify(aa: np.ndarray, bb: np.ndarray, chm: np.ndarray) -> np.ndarray:
            """Accept mask for candidate edges (aa, bb): vectorized MinHash
            estimate, then TRUE shingle-set Jaccard for the borderline band.
            Used for the main edge set AND the repair round (whose endpoints
            all appeared in failed edges, so their signatures are already in
            ``mat``)."""
            ia = order[np.searchsorted(sorted_ids, aa)]
            ib = order[np.searchsorted(sorted_ids, bb)]
            # unbiased Jaccard estimate, CHUNKED: gathering two
            # (n_edges × perm) matrices at once churns GBs of fresh
            # allocations (measured 40s vs 1.3s chunked at 2M edges on this
            # box) — process in bounded slices
            est = np.empty(len(ia))
            _CH = 1 << 17
            for s in range(0, len(ia), _CH):
                sl = slice(s, min(s + _CH, len(ia)))
                est[sl] = (mat[ia[sl]] == mat[ib[sl]]).mean(axis=1)

            accept = est >= jaccard_threshold + exact_margin
            accept |= chm  # same shingle set ⇒ true Jaccard 1.0
            borderline = (~accept) & (est >= jaccard_threshold - exact_margin)

            if not borderline.any():
                return accept
            # exact shingle-set Jaccard for the borderline edges: fetch only
            # those texts, compute sets ONCE per doc, then verify edge
            # BATCHES in parallel against a ray.put broadcast of the sorted
            # shingle arrays (a dup-heavy crawl corpus puts most candidate
            # edges in the borderline band — a driver-side loop here was the
            # measured bottleneck)
            import ray as _ray
            import ray.data as _rd

            bl = np.unique(
                np.concatenate([aa[borderline], bb[borderline]])
            )

            def collect_texts(t: pa.Table) -> pa.Table:
                ids = t.column(id_col).to_numpy(zero_copy_only=False)
                return t.filter(pa.array(np.isin(ids, bl))).select([id_col, text_col])

            def shingle_rows(t: pa.Table) -> pa.Table:
                # shingle once per doc in the worker, ship sorted arrays
                ids = t.column(id_col).to_pylist()
                texts = t.column(text_col).to_pylist()
                arrs = [
                    np.sort(_shingle_hashes(x, shingle_k)).astype(np.int64)
                    if x is not None else np.empty(0, np.int64)
                    for x in texts
                ]
                return pa.table(
                    {id_col: pa.array(ids),
                     "sh": pa.array([a.tobytes() for a in arrs], pa.binary())}
                )

            sh_tab = pa.concat_tables(
                text_source(bl)
                .map_batches(
                    collect_texts, batch_format="pyarrow", zero_copy_batch=True
                )
                .map_batches(shingle_rows, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")
            )
            shingles = {
                i: np.frombuffer(b, np.int64)
                for i, b in zip(sh_tab.column(id_col).to_pylist(),
                                sh_tab.column("sh").to_pylist())
            }
            bl_idx = np.flatnonzero(borderline)

            def _true_jaccard_ok(aa, bb, sh):
                oks = np.zeros(len(aa), bool)
                empty = np.empty(0, np.int64)
                for j in range(len(aa)):
                    s_a = sh.get(aa[j], empty)
                    s_b = sh.get(bb[j], empty)
                    inter = len(np.intersect1d(s_a, s_b, assume_unique=True))
                    union = len(s_a) + len(s_b) - inter
                    ja = (inter / union) if union else 1.0
                    oks[j] = ja >= jaccard_threshold
                return oks

            if len(bl_idx) < 20_000:
                # small borderline set: one driver pass beats a Ray job
                ok_mask = _true_jaccard_ok(aa[bl_idx], bb[bl_idx], shingles)
                accept[bl_idx[ok_mask]] = True
            else:
                # large borderline set (dup-heavy corpora): verify edge
                # batches in parallel against the broadcast shingle arrays
                sh_ref = _ray.put(shingles)
                edge_tab = pa.table(
                    {"a": pa.array(aa[bl_idx]), "b": pa.array(bb[bl_idx]),
                     "i": pa.array(bl_idx.astype(np.int64))}
                )

                def verify_batch(t: pa.Table) -> pa.Table:
                    sh = _ray.get(sh_ref)
                    aa = t.column("a").to_numpy(zero_copy_only=False)
                    bb = t.column("b").to_numpy(zero_copy_only=False)
                    return pa.table(
                        {"i": t.column("i"),
                         "ok": pa.array(_true_jaccard_ok(aa, bb, sh))}
                    )

                n_blocks = max(4, min(64, len(bl_idx) // 4096))
                verdicts = pa.concat_tables(
                    _rd.from_arrow(edge_tab)
                    .repartition(n_blocks)
                    .map_batches(verify_batch, batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow")
                )
                ok_idx = verdicts.column("i").to_numpy(zero_copy_only=False)[
                    verdicts.column("ok").to_numpy(zero_copy_only=False)
                ]
                accept[ok_idx] = True
            return accept

        accept = _verify(a_ids, b_ids, chain_mask)
        # repair round: a fallback star edge (fb=1, from an oversized LSH
        # group) that FAILED verification would silently disconnect true
        # pairs among its members — re-pair those members all-vs-all
        # (chunk-bounded) and verify the repair edges the same way
        if (fb_mask & ~accept).any():
            rep_a, rep_b = _repair_candidates(a_ids, b_ids, fb_mask, accept,
                                              cap=pair_cap)
            if len(rep_a):
                rep_acc = _verify(rep_a, rep_b, np.zeros(len(rep_a), bool))
                a_ids = np.concatenate([a_ids[accept], rep_a[rep_acc]])
                b_ids = np.concatenate([b_ids[accept], rep_b[rep_acc]])
                accept = np.ones(len(a_ids), bool)

        uf = _UnionFind()
        for a, b in zip(a_ids[accept], b_ids[accept]):
            uf.union(a, b)
        drop = {x for x in uf.parent if uf.find(x) != x}
    else:
        drop = set()

    drop_arr = np.array(sorted(drop))

    def remove_dups(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, drop_arr)))

    return _finish(
        ds.map_batches(remove_dups, batch_format="pyarrow", zero_copy_batch=True)
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """True character-k-gram Jaccard similarity."""
    if a is None or b is None:
        return 0.0
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (bit-vote), vectorized: token hashes
    via pandas siphash, bit matrix via broadcast shifts."""
    if not text:
        return 0
    toks = np.array(text.lower().split(), dtype=object)
    if len(toks) == 0:
        return 0
    h = pd.util.hash_array(toks, categorize=False).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(toks)
    out = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash64_batch(texts) -> np.ndarray:
    """SimHash of every text in ONE pass: all tokens hashed with a single
    pandas siphash call, per-document bit votes via np.add.reduceat over the
    shared bit matrix. Identical values to per-text ``simhash64``."""
    n = len(texts)
    tok_lists = [t.lower().split() if t else [] for t in texts]
    counts = np.array([len(ts) for ts in tok_lists], np.int64)
    out = np.zeros(n, np.uint64)
    nz = counts > 0
    if not nz.any():
        return out
    all_toks = np.array(
        [tok for ts in tok_lists for tok in ts], dtype=object
    )
    h = pd.util.hash_array(all_toks, categorize=False).astype(np.uint64)
    nz_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
    nz_ends = np.cumsum(counts)[nz]
    shifts = np.arange(64, dtype=np.uint64)
    # chunk the (tokens × 64) bit matrix at DOCUMENT boundaries with ≤2^17
    # tokens per chunk: bounded temps (this VM punishes GB-scale allocations)
    votes = np.empty((int(nz.sum()), 64), np.int64)
    CH_TOK = 1 << 17
    d = 0
    n_docs = len(nz_starts)
    while d < n_docs:
        e = int(np.searchsorted(nz_ends, nz_starts[d] + CH_TOK, side="left"))
        e = max(e, d + 1)
        lo, hi = nz_starts[d], nz_ends[e - 1]
        bits = ((h[lo:hi, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes[d:e] = np.add.reduceat(bits, nz_starts[d:e] - lo, axis=0)
        d = e
    pos = (votes * 2 - counts[nz][:, None]) > 0
    weights = np.uint64(1) << shifts
    out[nz] = (pos.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
                  distributed: bool = False, max_driver_edges: int = 4_000_000,
                  pair_cap: int = 256, pre_exact=True):
    """SimHash near-dup: 64-bit signature, 4×16-bit band blocking (any pair
    within hamming ≤3 shares at least one exact 16-bit band), verify hamming
    within buckets, drop non-representatives. ``distributed=True`` clusters
    with ops.cc min-label propagation instead of driver union-find (edges are
    already hamming-verified inside the buckets). ``pre_exact`` collapses
    byte-identical texts first (identical text ⟹ identical simhash ⟹
    hamming 0 ≤ any max_hamming — semantics-preserving, see
    minhash_lsh_dedup)."""

    if pre_exact:
        # materialized — consumed twice (signing + survivor filter);
        # pre_exact="hash_ids" → exchange-light pre-pass (see minhash)
        method = pre_exact if isinstance(pre_exact, str) else "full"
        ds = exact_dedup(
            ds, text_col=text_col, id_col=id_col, method=method
        ).materialize()
    num_buckets = 64

    def sign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        sh = simhash64_batch(texts)  # one siphash pass for the whole batch
        n = len(sh)
        # 4 band rows per doc, fully vectorized
        rep_sh = np.repeat(sh, 4)
        bands = np.tile(np.arange(4, dtype=np.uint64), n)
        keys = ((rep_sh >> (bands * np.uint64(16))) & np.uint64(0xFFFF)).astype(np.int64)
        bkt = ((keys * 4 + bands.astype(np.int64)) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "_bkt": pa.array(bkt),
                "band": pa.array(bands.astype(np.int32)),
                "key": pa.array(keys.astype(np.int32)),
                id_col: pa.array(np.repeat(ids, 4)),
                # order-preserving signed storage: v - 2^63 ≡ flipping the MSB
                "sig": pa.array((rep_sh ^ np.uint64(1 << 63)).view(np.int64)),
            }
        )

    def bucket_edges(g: pa.Table) -> pa.Table:
        # all pairs within each (band,key) bucket (star-to-first would miss
        # true pairs whenever the first member fails the hamming check), then
        # one vectorized hamming verify over the whole pair list. Verification
        # is LOCAL here, so the oversized-group star fallback repairs in
        # place: members whose fb star edge fails the hamming check are
        # re-paired all-vs-all (chunk-bounded) and re-verified immediately.
        df = g.to_pandas()
        a_np, b_np, fb = _group_all_pairs(df, ["band", "key"], id_col,
                                          cap=pair_cap)
        if not len(a_np):
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        sig_map = pd.Series(
            # undo the order-preserving MSB flip with an integer XOR — adding
            # 2**63 to an int64 array silently promotes to float64 on numpy
            # 1.x and rounds away the low ~10 signature bits
            df["sig"].to_numpy().astype(np.int64).view(np.uint64)
            ^ np.uint64(1 << 63),
            index=df[id_col].to_numpy(),
        )
        sig_map = sig_map[~sig_map.index.duplicated()]

        def _ham_keep(aa: np.ndarray, bb: np.ndarray) -> np.ndarray:
            xor = sig_map.loc[aa].to_numpy() ^ sig_map.loc[bb].to_numpy()
            bits = np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8), axis=1)
            return bits.sum(axis=1) <= max_hamming

        keep = _ham_keep(a_np, b_np)
        if (fb.astype(bool) & ~keep).any():
            rep_a, rep_b = _repair_candidates(a_np, b_np, fb.astype(bool),
                                              keep, cap=pair_cap)
            if len(rep_a):
                rep_keep = _ham_keep(rep_a, rep_b)
                a_np = np.concatenate([a_np[keep], rep_a[rep_keep]])
                b_np = np.concatenate([b_np[keep], rep_b[rep_keep]])
                keep = np.ones(len(a_np), bool)
        return pa.table({"a": pa.array(a_np[keep], pa.int64()),
                         "b": pa.array(b_np[keep], pa.int64())})

    signed = ds.map_batches(
        sign, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # signature table only — tiny vs the corpus
    pairs = signed.groupby("_bkt").map_groups(bucket_edges, batch_format="pyarrow")
    if distributed:
        return _cc_drop(ds, pairs, id_col)
    pairs, edges = _edges_or_distributed(pairs, max_driver_edges)
    if edges is None:  # auto-switch: edges exceed the driver cap
        return _cc_drop(ds, pairs, id_col)
    uf = _UnionFind()
    for a, b in zip(edges["a"].to_numpy(), edges["b"].to_numpy()):
        uf.union(a, b)
    drop_arr = np.array(sorted(x for x in uf.parent if uf.find(x) != x))

    def remove_dups(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, drop_arr)))

    return ds.map_batches(remove_dups, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.98,
    num_planes: int = 16,
    seed: int = 3,
    dim: int | None = None,
    distributed: bool = False,
    max_driver_edges: int = 4_000_000,
    pre_exact: bool = True,
):
    """Embedding near-dup: random-hyperplane LSH bucket → within-bucket exact
    cosine → union-find → keep min-id. ``num_planes`` sign bits per vector;
    exact cosine verification happens only within buckets.

    ``pre_exact`` collapses BYTE-identical vectors first (keep min id per
    distinct vector): an identical vector has cosine 1.0 ≥ any threshold
    with its copy and identical LSH bits, so every copy always lands in its
    original's cluster carrying the group-min id — semantics-preserving at
    the vector level (no assumption about the texts behind the vectors),
    same argument as the text pre-pass in minhash_lsh_dedup."""
    import ray

    if pre_exact:

        def add_vec_key(t: pa.Table) -> pa.Table:
            # two independent 64-bit digests of the raw bytes, fully
            # vectorized (one hash pass over the flattened element view, then
            # an unweighted and a position-weighted fold): distinct vectors
            # collide on BOTH with probability ~2^-128 — treat as identity
            from wrangler_ray.ops.similarity import vecs_np

            raw = vecs_np(t.column(vec_col))
            n, d = raw.shape
            eh = (
                pd.util.hash_array(raw.view(np.uint32).ravel(), categorize=False)
                .astype(np.uint64)
                .reshape(n, d)
            )
            w = (np.arange(d, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
            with np.errstate(over="ignore"):
                h1 = eh.sum(axis=1, dtype=np.uint64)
                h2 = (eh * w[None, :]).sum(axis=1, dtype=np.uint64)
            t = t.append_column("_vh1", pa.array(h1.astype(np.int64)))
            t = t.append_column("_vh2", pa.array(h2.astype(np.int64)))
            return t.append_column(
                "_vb", pa.array((h1 % np.uint64(128)).astype(np.int32))
            )

        def keep_first_vec(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            idx = df.groupby(["_vh1", "_vh2"], sort=False)[id_col].idxmin()
            return pa.Table.from_pandas(
            df.loc[idx], preserve_index=False
        ).replace_schema_metadata(None)

        ds = (
            ds.map_batches(add_vec_key, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_vb")
            .map_groups(keep_first_vec, batch_format="pyarrow")
            .drop_columns(["_vh1", "_vh2", "_vb"])
        ).materialize()  # consumed by dim probe + signing + survivor filter

    if dim is None:
        first = ds.take(1)
        if not first:  # empty corpus — nothing to dedup
            return ds
        dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, num_planes).astype(np.float32)
    planes_ref = ray.put(planes)

    def sign(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        from wrangler_ray.ops.similarity import vecs_np

        vecs = vecs_np(t.column(vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        bits = (unit @ pl) > 0
        keys = np.zeros(len(vecs), np.int64)
        for j in range(num_planes):
            keys |= bits[:, j].astype(np.int64) << j
        out = pa.table(
            {
                "_bkt": pa.array((keys % 256).astype(np.int32)),
                "key": pa.array(keys, pa.int64()),
                id_col: t.column(id_col),
                vec_col: t.column(vec_col),
            }
        )
        return out

    def bucket_edges(g: pa.Table) -> pa.Table:
        # all pairs within each LSH key bucket, exact cosine verified —
        # BATCHED by group-size class: groups of equal size stack into one
        # (n_groups, s, d) tensor and verify with a single einsum, instead of
        # one small matmul per group
        from wrangler_ray.ops.similarity import vecs_np

        if g.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        order = pc.sort_indices(
            g, sort_keys=[("key", "ascending"), (id_col, "ascending")]
        )
        g = g.take(order)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        vecs = vecs_np(g.column(vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        # group boundaries over the sorted keys
        new_grp = np.ones(len(keys), bool)
        new_grp[1:] = keys[1:] != keys[:-1]
        gid = np.cumsum(new_grp) - 1
        counts = np.bincount(gid)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        a_out, b_out = [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            gsel = np.nonzero(counts == s)[0]
            idx = offsets[gsel][:, None] + np.arange(s)[None, :]  # (n_g, s)
            m_ids = ids[idx]
            m_vec = unit[idx]  # (n_g, s, d)
            sims = np.einsum("gsd,gtd->gst", m_vec, m_vec)
            iu, ju = np.triu_indices(int(s), k=1)
            hit = sims[:, iu, ju] >= cosine_threshold  # (n_g, n_pairs)
            gi, pi = np.nonzero(hit)
            a_out.append(m_ids[gi, iu[pi]])
            b_out.append(m_ids[gi, ju[pi]])
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                         "b": pa.array(np.concatenate(b_out), pa.int64())})

    signed = ds.map_batches(
        sign, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # signature table only — tiny vs the corpus
    pairs = signed.groupby("_bkt").map_groups(bucket_edges, batch_format="pyarrow")
    if distributed:
        return _cc_drop(ds, pairs, id_col)
    pairs, edges = _edges_or_distributed(pairs, max_driver_edges)
    if edges is None:  # auto-switch: edges exceed the driver cap
        return _cc_drop(ds, pairs, id_col)
    uf = _UnionFind()
    for a, b in zip(edges["a"].to_numpy(), edges["b"].to_numpy()):
        uf.union(a, b)
    drop_arr = np.array(sorted(x for x in uf.parent if uf.find(x) != x))

    def remove_dups(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, drop_arr)))

    return ds.map_batches(remove_dups, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
    max_driver_edges: int = 4_000_000,
):
    """n-gram-Jaccard dedup: exact character-k-gram Jaccard is the decision
    metric; MinHash+LSH (high-recall parameters: 128 perms × 32 bands →
    band-collision probability ≈ j^4) only generates the candidate pairs so
    no O(n²) comparison ever happens. Every candidate pair is verified with
    the TRUE shingle-set Jaccard before union-find."""
    return minhash_lsh_dedup(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=128,
        bands=32,
        jaccard_threshold=jaccard_threshold,
        shingle_k=shingle_k,
        max_driver_edges=max_driver_edges,
    )


def _distributed_dedup_finish(ds, signed, pairs, id_col, num_perm,
                              jaccard_threshold, pair_cap: int = 256):
    """No-driver-state tail of minhash_lsh_dedup: chain edges (ch=1: identical
    shingle sets, guaranteed duplicates) skip verification entirely — on a
    dup-heavy corpus that is the vast majority of edges; only the
    representative pairs carry signatures through the two bucketed-groupby
    attach stages (NO Dataset.join — Ray 2.49's hash-join aggregator rejects
    the empty partitions tiny/skewed key spaces produce) and the MinHash
    estimate filter. Clustering + drop run via distributed min-label
    propagation. Every step is a Dataset operation."""
    import ray.data as rd

    from wrangler_ray.ops.cc import connected_components, drop_non_representatives

    B = 64
    sig_bytes = num_perm * 8

    def split_chain(t: pa.Table, want_chain: bool) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "fb": pa.array([], pa.int8())})
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty if not want_chain else pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        if "fb" not in t.column_names:
            t = t.append_column("fb", pa.array(np.zeros(t.num_rows, np.int8)))
        if "ch" not in t.column_names:
            # unflagged edge stream: everything needs verification
            return t.select(["a", "b", "fb"]) if not want_chain else pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ch = t.column("ch").to_numpy(zero_copy_only=False).astype(bool)
        if want_chain:
            return t.filter(pa.array(ch)).select(["a", "b"])
        return t.filter(pa.array(~ch)).select(["a", "b", "fb"])

    import functools

    chain_edges = pairs.map_batches(
        functools.partial(split_chain, want_chain=True),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = pairs.map_batches(
        functools.partial(split_chain, want_chain=False),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _frame(k, other, sig, side, fb=None):
        n = len(k)
        if fb is None:
            fb = np.zeros(n, np.int8)
        return pa.table(
            {
                "k": pa.array(np.asarray(k, np.int64), pa.int64()),
                "other": pa.array(np.asarray(other, np.int64), pa.int64()),
                "sig": pa.array(list(sig), pa.binary()),
                "side": pa.array(np.full(n, side, np.int8)),
                "fb": pa.array(np.asarray(fb, np.int8)),
                "_b": pa.array((np.asarray(k, np.int64) % B).astype(np.int32)),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _frame([], [], [], 0)
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        fb = (
            t.column("fb").to_numpy(zero_copy_only=False).astype(np.int8)
            if "fb" in t.column_names
            else np.zeros(len(a), np.int8)
        )
        return _frame(a, b, [b""] * len(a), 0, fb)

    def sig_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return _frame([], [], [], 1)
        n = t.num_rows
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = (
            t.column("sig").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.int64).reshape(n, num_perm)
        )
        return _frame(ids, np.zeros(n, np.int64), [row.tobytes() for row in mat], 1)

    def attach(g: pa.Table, out_key_is_other: bool) -> pa.Table:
        """side-1 rows carry sigs for key k; side-0 rows are edges keyed k.
        Emit edges re-keyed (optionally on `other`) with sig appended."""
        if g.num_rows == 0 or "k" not in g.column_names:
            return _frame([], [], [], 0)
        df = g.to_pandas()
        sig_map = df[df["side"] == 1].set_index("k")["sig"]
        e = df[df["side"] == 0]
        if not len(e):
            return _frame([], [], [], 0)
        looked = e["k"].map(sig_map)
        ok = looked.notna()
        e = e[ok]
        looked = looked[ok]
        fb = e["fb"].to_numpy(np.int8)
        if out_key_is_other:
            # re-key on the other endpoint; carry this endpoint + its sig by
            # CONCATENATING it onto any sig already present (stage-2 edges
            # then hold sig_a + sig_b back to back)
            new_sig = (e["sig"] + looked).to_numpy()
            return _frame(e["other"].to_numpy(np.int64), e["k"].to_numpy(np.int64),
                          new_sig, 0, fb)
        return _frame(e["k"].to_numpy(np.int64), e["other"].to_numpy(np.int64),
                      (e["sig"] + looked).to_numpy(), 0, fb)

    def attach_sigs(edge_ds):
        """Two bucketed-groupby stages: append sig_a (re-key on b), then
        sig_b — edges come out carrying both signatures back to back."""
        st1 = (
            edge_ds.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True)
            .union(signed.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("_b")
            .map_groups(lambda g: attach(g, out_key_is_other=True), batch_format="pyarrow")
        )
        return (
            st1.union(signed.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("_b")
            .map_groups(lambda g: attach(g, out_key_is_other=False), batch_format="pyarrow")
        )

    def est_split(t: pa.Table, want_failed_fb: bool) -> pa.Table:
        """MinHash-estimate verdicts over sig-carrying edges: emit either the
        ACCEPTED edges, or (fb mode) EVERY fallback-star edge with its
        verdict — the repair round needs the passed members of a failing hub
        too, not just the failures."""
        if t.num_rows == 0 or "k" not in t.column_names:
            cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            if want_failed_fb:
                cols["ok"] = pa.array([], pa.bool_())
            return pa.table(cols)
        b_ids = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        a_ids = t.column("other").to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = t.column("sig").to_pylist()
        both = np.stack([np.frombuffer(x, np.int64) for x in sigs])
        sa, sb = both[:, :num_perm], both[:, num_perm:]
        est = (sa == sb).mean(axis=1)
        if want_failed_fb:
            fbm = t.column("fb").to_numpy(zero_copy_only=False).astype(bool)
            return pa.table(
                {"a": pa.array(a_ids[fbm], pa.int64()),
                 "b": pa.array(b_ids[fbm], pa.int64()),
                 "ok": pa.array(est[fbm] >= jaccard_threshold)}
            )
        keep = est >= jaccard_threshold
        return pa.table(
            {"a": pa.array(a_ids[keep], pa.int64()), "b": pa.array(b_ids[keep], pa.int64())}
        )

    import functools as _ft

    st2 = attach_sigs(pairs).materialize()
    verified = st2.map_batches(
        _ft.partial(est_split, want_failed_fb=False),
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(chain_edges)

    # repair round: fallback star edges (fb=1, oversized LSH groups) that
    # failed the estimate would silently disconnect true pairs among their
    # members — for every hub with ≥1 failed edge, re-pair ALL its star
    # members (passed and failed: a failed member's true duplicate may be a
    # passed one) with chunk-bounded all-pairs. fb edges exist only for
    # oversized LSH groups, so the driver sees ≤ one row per oversized-group
    # member, never the corpus
    fb_edges = st2.map_batches(
        _ft.partial(est_split, want_failed_fb=True),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    if fb_edges.count() > 0:
        ft = pa.concat_tables(
            fb_edges.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        fa = ft.column("a").to_numpy(zero_copy_only=False)
        fbn = ft.column("b").to_numpy(zero_copy_only=False)
        fok = ft.column("ok").to_numpy(zero_copy_only=False).astype(bool)
        rep_a, rep_b = _repair_candidates(
            fa, fbn, np.ones(len(fa), bool), fok, cap=pair_cap
        )
        if len(rep_a):
            repair_ds = rd.from_arrow(
                pa.table({"a": pa.array(rep_a, pa.int64()),
                          "b": pa.array(rep_b, pa.int64())})
            )
            verified = verified.union(
                attach_sigs(repair_ds).map_batches(
                    _ft.partial(est_split, want_failed_fb=False),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
            )

    labels = connected_components(verified.materialize())
    return drop_non_representatives(ds, labels, id_col=id_col)
