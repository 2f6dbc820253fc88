"""Driver-side VALUES oracles for queries whose math is not SQL-expressible.

The driver's correctness gate wants a DuckDB oracle per query. For S2
Hilbert encoding, IVF k-means probing, and the multimodal codec, the
*expected rows* are deterministic functions of the fixture inputs — so the
oracle is computed here with an independent numpy/stdlib twin of the
operator (never by running the Spark path) and emitted as a literal
`VALUES` relation. This pins the engine's output hard: any regression in
the distributed path breaks the hash match.

These builders read the driver's parquet fixtures directly (pyarrow, no
Spark) at oracle-construction time. The correctness gate runs at sf=0.01;
`SPARK_GRAFT_ORACLE_SF_DIR` overrides for local experimentation.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

# Hot-spot centers duplicated from synth.HOT_CENTERS would risk drift; import.
from .. import synth  # noqa: E402
from ..functions import s2  # noqa: E402


def _doc_ids(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    return t.column("doc_id").to_numpy().astype(np.int64)


def pages_ground_truth_np(sf_dir: str):
    """Integer-exact numpy twin of synth.pages_sql's coordinate derivation:
    (page_id, lat_s, lon_s) for geo pages only (has_geo = page_id%10 < 6)."""
    pid = np.sort(_doc_ids(sf_dir))
    m = pid % 10
    hc = pid % 5
    off1 = (pid * 7919) % 1000 - 500
    off2 = (pid * 104729) % 1000 - 500
    cold_lat = (pid * 99991) % 1600000 - 800000
    cold_lon = (pid * 15485863) % 3600000 - 1800000
    hot_lat = np.array([c[1] for c in synth.HOT_CENTERS], dtype=np.int64)[hc]
    hot_lon = np.array([c[2] for c in synth.HOT_CENTERS], dtype=np.int64)[hc]
    lat_s = np.where(m < 2, hot_lat + off1, cold_lat)
    lon_s = np.where(m < 2, hot_lon + off2, cold_lon)
    geo = m < 6
    return pid[geo], lat_s[geo], lon_s[geo]


def s2_cells_values_sql(sf_dir: str = ORACLE_SF_DIR, level: int = 12) -> str:
    """Expected (page_id, s2_cell_l12) rows — numpy S2 twin on the integer
    ground truth (lat_s/1e4 is the same correctly-rounded double the
    extraction path parses from the 4-decimal text)."""
    pid, lat_s, lon_s = pages_ground_truth_np(sf_dir)
    cell = s2.cell_id(lat_s / 1e4, lon_s / 1e4, level=level)
    rows = ", ".join(f"({p}, {c})" for p, c in zip(pid.tolist(), cell.tolist()))
    return (
        f"SELECT CAST(page_id AS BIGINT) AS page_id, "
        f"CAST(s2_cell_l{level} AS BIGINT) AS s2_cell_l{level} "
        f"FROM (VALUES {rows}) AS t(page_id, s2_cell_l{level})"
    )


def ivf_topk_values_sql(
    sf_dir: str = ORACLE_SF_DIR, n_lists: int = 16, nprobe: int = 4, k: int = 5
) -> str:
    """Expected (qid, vec_id, rank) for ann_ivf_topk — an independent numpy
    replica of operators/similarity.ivf_topk: same deterministic centroids
    (shared centroids_np kernel), same nearest-list assignment, same probed
    lists, same per-pair einsum cosine and (cos DESC, vec_id) tie-break."""
    import pyarrow.parquet as pq

    from ..operators import similarity as sim

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    order = np.argsort(vid, kind="stable")
    vid, mat = vid[order], mat[order]

    cents = sim.centroids_np(mat[:4096], n_lists=n_lists)
    norm = sim._normalize(mat)
    s = norm @ cents.T
    corpus_list = np.argsort(-s, axis=1)[:, :1].astype(np.int32).ravel()

    qmask = vid < 10
    q_lists = np.argsort(-s[qmask], axis=1)[:, :nprobe].astype(np.int32)
    qids = vid[qmask]

    rows = []
    for qi, qid in enumerate(qids.tolist()):
        cand = np.isin(corpus_list, q_lists[qi]) & (vid != qid)
        cv = vid[cand]
        # per-pair einsum, exactly like _cosine_cols (not a GEMM)
        qn = np.repeat(norm[vid == qid], len(cv), axis=0)
        cos = np.einsum("ij,ij->i", qn, norm[cand])
        sel = np.lexsort((cv, -cos))[:k]
        for rank, j in enumerate(sel, start=1):
            rows.append((qid, int(cv[j]), rank))
    vals = ", ".join(f"({q}, {v}, {r})" for q, v, r in rows)
    return (
        "SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, "
        f"CAST(rank AS INT) AS rank FROM (VALUES {vals}) AS t(qid, vec_id, rank)"
    )


def lsh_topk_values_sql(
    sf_dir: str = ORACLE_SF_DIR,
    n_planes: int = 12,
    k: int = 5,
    multi_probe: bool = True,
    seed: int = 42,
) -> str:
    """Expected (qid, vec_id, rank) for ann_lsh_topk — an independent numpy
    replica of operators/similarity.ann_topk_lsh: same seeded hyperplanes,
    same sign-bucket codes, same hamming-1 multi-probe set, same per-pair
    einsum cosine and (cos DESC, vec_id) tie-break. A query whose probed
    buckets hold fewer than k candidates emits fewer rows — both sides."""
    import pyarrow.parquet as pq

    from ..operators import similarity as sim

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])

    planes = sim.hyperplanes(mat.shape[1], n_planes, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    buckets = ((mat @ planes.T) > 0) @ weights
    norm = sim._normalize(mat)

    rows = []
    for qi in np.nonzero(vid < 10)[0]:
        qid = int(vid[qi])
        probes = {int(buckets[qi])}
        if multi_probe:
            probes |= {int(buckets[qi]) ^ (1 << j) for j in range(n_planes)}
        cand = np.isin(buckets, list(probes)) & (vid != qid)
        cv = vid[cand]
        if not len(cv):
            continue
        # per-pair einsum, exactly like _cosine_cols (not a GEMM)
        qn = np.repeat(norm[qi : qi + 1], len(cv), axis=0)
        cos = np.einsum("ij,ij->i", qn, norm[cand])
        sel = np.lexsort((cv, -cos))[:k]
        for rank, j in enumerate(sel, start=1):
            rows.append((qid, int(cv[j]), rank))
    vals = ", ".join(f"({q}, {v}, {r})" for q, v, r in rows)
    return (
        "SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, "
        f"CAST(rank AS INT) AS rank FROM (VALUES {vals}) AS t(qid, vec_id, rank)"
    )


def multimodal_features_values_sql(n: int = 200) -> str:
    """Expected feature rows from the stdlib/numpy codec twin
    (operators/multimodal.numpy_oracle_features)."""
    from ..operators import multimodal as mm

    rows = []
    for aid, kind, w, h, f, nb, mean, chk in mm.numpy_oracle_features(n):
        # doubles go through a *string* literal: DuckDB parses bare decimal
        # literals as DECIMAL (drops the last ulp); VARCHAR -> DOUBLE casts
        # are correctly rounded, so repr() round-trips exactly
        rows.append(f"({aid}, '{kind}', {w}, {h}, {f}, {nb}, '{mean!r}', {chk})")
    return (
        "SELECT CAST(asset_id AS BIGINT) AS asset_id, CAST(kind AS VARCHAR) AS kind, "
        "CAST(width AS INT) AS width, CAST(height AS INT) AS height, "
        "CAST(n_frames AS INT) AS n_frames, CAST(n_bytes AS BIGINT) AS n_bytes, "
        "CAST(mean_byte AS DOUBLE) AS mean_byte, CAST(checksum AS BIGINT) AS checksum "
        f"FROM (VALUES {', '.join(rows)}) AS t(asset_id, kind, width, height, n_frames, n_bytes, mean_byte, checksum)"
    )


def resize_values_sql(n: int = 200, out_w: int = 16, out_h: int = 16) -> str:
    """Expected (asset_id, n_bytes, payload_md5) for multimodal_resize —
    the nearest-neighbor resize recomputed in plain numpy/stdlib."""
    import struct

    from ..operators import multimodal as mm

    rows = []
    kinds = ["image", "audio", "video"]
    for aid in range(n):
        kind = kinds[aid % 3]
        if kind != "image":
            continue
        w, h, _f, body = mm._decode_fake("FAKE", mm.make_payload(aid, kind))
        img = body.reshape(h, w)
        yi = (np.arange(out_h) * h // out_h).astype(np.int64)
        xi = (np.arange(out_w) * w // out_w).astype(np.int64)
        payload = struct.pack(">III", out_w, out_h, 1) + img[yi][:, xi].tobytes()
        rows.append(
            f"({aid}, {len(payload)}, '{hashlib.md5(payload).hexdigest()}')"
        )
    return (
        "SELECT CAST(asset_id AS BIGINT) AS asset_id, CAST(n_bytes AS BIGINT) AS n_bytes, "
        "CAST(payload_md5 AS VARCHAR) AS payload_md5 "
        f"FROM (VALUES {', '.join(rows)}) AS t(asset_id, n_bytes, payload_md5)"
    )


def frame_sample_values_sql(n: int = 200, every_k: int = 2) -> str:
    """Expected (asset_id, frame_idx, n_bytes, payload_md5) rows for the
    frame-sampling operator: the payload digests are computed by re-running
    the fake codec's frame cut in plain python/numpy."""
    import struct

    from ..operators import multimodal as mm

    rows = []
    kinds = ["image", "audio", "video"]
    for aid in range(n):
        kind = kinds[aid % 3]
        if kind != "video":
            continue
        payload = mm.make_payload(aid, kind)
        w, h, f, body = mm._decode_fake("FAKE", payload)
        frames = body.reshape(f, h * w)
        for idx in range(0, f, every_k):
            fp = struct.pack(">III", w, h, 1) + frames[idx].tobytes()
            md5 = hashlib.md5(fp).hexdigest()
            rows.append(f"({aid}, {idx}, {len(fp)}, '{md5}')")
    return (
        "SELECT CAST(asset_id AS BIGINT) AS asset_id, CAST(frame_idx AS INT) AS frame_idx, "
        "CAST(n_bytes AS BIGINT) AS n_bytes, CAST(payload_md5 AS VARCHAR) AS payload_md5 "
        f"FROM (VALUES {', '.join(rows)}) AS t(asset_id, frame_idx, n_bytes, payload_md5)"
    )
