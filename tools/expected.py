"""Independent pure-Python/numpy replicas of the engine-hash-dependent
operators, used to build literal-table (VALUES) DuckDB oracles for the
queries whose semantics depend on seeded hashes (simhash bit folds, SRP
hyperplanes, IVF k-means) or on an imperative scan (snippet generation)
and therefore cannot be expressed as relational SQL over the base tables.

Everything here recomputes the expected answer from the parquet inputs
WITHOUT Spark: duckdb scan + stdlib/numpy math. The driver's correctness
gate then compares the distributed execution against these driver-side
replays — exactly the "precompute expected ids with the pure-Python
kernel and register as literal-table oracles" pattern.

Floating-point discipline: Spark's ``aggregate`` folds arrays strictly
left-to-right in float64 and ``F.round`` is HALF_UP on the shortest
decimal repr (java BigDecimal.valueOf). The replicas use sequential
Python-float folds and a Decimal HALF_UP quantize so the rounded values
agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math
import random
import re
from decimal import ROUND_HALF_UP, Decimal


def round6(x: float) -> float:
    """Spark F.round(col, 6): HALF_UP on the double's shortest repr."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _sdot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _snorm(a) -> float:
    s = 0.0
    for x in a:
        s = s + x * x
    return math.sqrt(s)


def _load_embeddings(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    return [int(r[0]) for r in rows], [[float(x) for x in r[1]] for r in rows]


def _load_documents(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [(int(r[0]), r[1]) for r in rows]


# --------------------------------------------------------------------------
# SimHash (replica of operators/dedup.py::_simhash64 + chunk-join pairs)
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _simhash64_py(text: str, cache: dict) -> int:
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    vecs = []
    for t in toks:
        v = cache.get(t)
        if v is None:
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            )
            v = ((h >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1
            cache[t] = v
        vecs.append(v)
    counts = np.sum(vecs, axis=0)
    v = int(np.packbits((counts > 0)[::-1]).view(">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_pairs_expected(sf_dir: str, max_hamming: int = 3):
    """All (id_a, id_b, hamming) with Hamming(simhash) ≤ max_hamming, by
    brute-force over all pairs (the 4×16-bit pigeonhole join in the Spark
    operator is complete for max_hamming ≤ 3, so outputs coincide)."""
    docs = _load_documents(sf_dir)
    cache: dict = {}
    fps = [(doc_id, _simhash64_py(text, cache)) for doc_id, text in docs]
    out = []
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            a, b = fps[i], fps[j]
            ham = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                lo, hi = (a, b) if a[0] < b[0] else (b, a)
                out.append((lo[0], hi[0], ham))
    return out


# --------------------------------------------------------------------------
# SRP-LSH ANN (replica of operators/similarity.py::ann_topk_lsh)
# --------------------------------------------------------------------------


def _planes(num_planes: int, dim: int, seed: int):
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def _cosine_topk_py(ids, vecs, query_vec, k: int):
    qn = _snorm(query_vec)
    scored = [
        (round6(_sdot(v, query_vec) / (_snorm(v) * qn)), i) for i, v in zip(ids, vecs)
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(i, c) for c, i in scored[:k]]


def ann_topk_lsh_expected(
    sf_dir: str, k: int = 10, num_planes: int = 8, dim: int = 64, seed: int = 42
):
    ids, vecs = _load_embeddings(sf_dir)
    query_vec = vecs[ids.index(0)]
    planes = _planes(num_planes, dim, seed)

    def bucket(v):
        b = 0
        for i, p in enumerate(planes):
            if _sdot(v, p) >= 0:
                b |= 1 << i
        return b

    qb = bucket(query_vec)
    members = [(i, v) for i, v in zip(ids, vecs) if bucket(v) == qb]
    return _cosine_topk_py([i for i, _ in members], [v for _, v in members], query_vec, k)


# --------------------------------------------------------------------------
# IVF-Flat ANN (replica of operators/similarity.py::ivf_topk)
# --------------------------------------------------------------------------


def _kmeans_replay(
    sf_dir: str,
    n_centroids: int,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 5,
):
    """Shared oracle-side replay of ivf_assign's centroid training: the
    portable md5 sample order, seeded init, Lloyd with empty-cluster
    keep, and the first-min cluster rule. Returns (ids, vecs, cent,
    cluster_fn) — used by both the IVF and SemDeDup replicas so a change
    to the training recipe can only be mirrored in ONE place."""
    import numpy as np

    ids, vecs = _load_embeddings(sf_dir)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )[:sample_size]
    mat = np.vstack([np.asarray(vecs[i], dtype=np.float64) for i in order])
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(n_iter):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    cent = [list(map(float, c)) for c in centroids]

    def cluster(v):
        dists = [
            _sdot([x - y for x, y in zip(v, c)], [x - y for x, y in zip(v, c)])
            for c in cent
        ]
        return dists.index(min(dists))

    return ids, vecs, cent, cluster


def ivf_topk_expected(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 5,
):
    import numpy as np

    ids, vecs, cent, cluster = _kmeans_replay(
        sf_dir, n_centroids, seed, sample_size, n_iter
    )
    query_vec = vecs[ids.index(0)]
    q = np.asarray(query_vec, dtype=np.float64)
    probe_order = sorted(((((np.asarray(c) - q) ** 2).sum(), i) for i, c in enumerate(cent)))
    probe = {i for _, i in probe_order[:n_probe]}
    members = [(i, v) for i, v in zip(ids, vecs) if cluster(v) in probe]
    return _cosine_topk_py([i for i, _ in members], [v for _, v in members], query_vec, k)


# --------------------------------------------------------------------------
# Snippets (driver-side replay of kernels/snippets.py over the parquet text)
# --------------------------------------------------------------------------


def snippets_full_expected(sf_dir: str, query: str, snippet_length: int = 200):
    from readur_spark.kernels.snippets import generate_snippets

    out = []
    for doc_id, text in _load_documents(sf_dir):
        for s in generate_snippets(text or "", query, snippet_length):
            out.append(
                (
                    doc_id,
                    s["text"],
                    s["start_offset"],
                    s["end_offset"],
                    s["highlight_start"],
                    s["highlight_end"],
                )
            )
    return out


# --------------------------------------------------------------------------
# Near-dup cluster dedup: DuckDB computes the pair graph (the same SQL the
# pairwise oracle uses), pure-Python union-find derives the components
# --------------------------------------------------------------------------


def cluster_drop_ids(sf_dir: str, pairs_sql: str) -> list[int]:
    """Ids that cluster dedup deletes: every member of a connected
    component except its minimum. ``pairs_sql`` must select (id_a, id_b)
    over the registered views."""
    import duckdb

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    pairs = con.execute(pairs_sql).fetchall()
    con.close()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ((int(r[0]), int(r[1])) for r in pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted(x for x in parent if find(x) != x)


# --------------------------------------------------------------------------
# Image OCR ladder (driver-side replay of kernels/ocr_engine over the same
# synthetic rasters the Spark query builds)
# --------------------------------------------------------------------------


def image_ocr_expected(sf_dir: str, w: int = 340, h: int = 312):
    import duckdb

    from readur_spark.corpus import quality_png_bytes
    from readur_spark.kernels.ocr_engine import FakeOcrEngine, ocr_image_bytes

    con = duckdb.connect()
    ids = [
        int(r[0])
        for r in con.execute(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    engine = FakeOcrEngine()
    out = []
    for doc_id in ids:
        res = ocr_image_bytes(quality_png_bytes(doc_id, w, h), engine)
        out.append(
            (doc_id, res["status"], res["failure_reason"], res["word_count"], float(res["confidence"]))
        )
    return out


# --------------------------------------------------------------------------
# VALUES-literal SQL rendering
# --------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(cols: list[str], types: list[str], rows: list[tuple]) -> str:
    """Render rows as a typed literal table: stable column names/types so
    the driver's column-name + value-hash comparison is well-defined."""
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    if not rows:
        one = ", ".join("NULL" for _ in cols)
        return f"SELECT {sel} FROM (VALUES ({one})) AS t({', '.join(cols)}) WHERE FALSE"
    vals = ", ".join("(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
    return f"SELECT {sel} FROM (VALUES {vals}) AS t({', '.join(cols)})"


def winnow_overlap_expected(sf_dir: str, min_shared: int = 5, k: int = 8, window: int = 4):
    """Driver-side replay of the winnowing overlap operator (same kernel,
    sequential, inverted-index in a dict — verifies the distributed
    execution like image_ocr_expected does for the OCR ladder)."""
    from collections import defaultdict

    from readur_spark.operators.dedup import _winnow_py

    fp_docs = defaultdict(set)
    for doc_id, text in _load_documents(sf_dir):
        for fp, _pos in _winnow_py(text or "", k, window):
            fp_docs[fp].add(doc_id)
    counts = defaultdict(int)
    for docs in fp_docs.values():
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                counts[(ds[i], ds[j])] += 1
    return sorted(
        (a, b, c) for (a, b), c in counts.items() if c >= min_shared
    )


def duplicate_spans_expected(
    sf_dir: str, min_len: int = 50, k: int = 25, window: int = 16
):
    """Driver-side replay of operators/dedup.duplicate_spans (same winnow +
    seed-extension kernels, sequential dict-based inverted index) —
    verifies the distributed seeded formulation like
    winnow_overlap_expected does for the fingerprint join."""
    from collections import defaultdict

    from readur_spark.operators.dedup import _pair_spans, _winnow_py

    docs = _load_documents(sf_dir)
    fp_index = defaultdict(list)
    for doc_id, text in docs:
        for fp, pos in _winnow_py(text or "", k, window):
            fp_index[fp].append((doc_id, pos))
    seeds = defaultdict(set)
    for entries in fp_index.values():
        if len({d for d, _ in entries}) > 1000:  # df-cap parity
            continue
        for i in range(len(entries)):
            for j in range(len(entries)):
                (da, pa), (db, pb) = entries[i], entries[j]
                if da < db:
                    seeds[(da, db)].add((pa, pb))
    texts = dict(docs)
    out = []
    for (da, db), sd in seeds.items():
        spans, _truncated = _pair_spans(
            texts[da], texts[db], sorted(sd), k, min_len
        )
        for sa, sb, ln in spans:
            out.append((da, db, sa, sb, ln))
    return sorted(out)


def decontaminate_expected(
    sf_dir: str,
    min_len: int = 50,
    k: int = 25,
    window: int = 16,
    eval_mod: int = 20,
):
    """Driver-side replay of operators/dedup.decontaminate with
    heldout = docs where doc_id % eval_mod == 0, exclude_same_id=True.
    Returns (doc_id, n_eval_docs, n_spans, contaminated_chars)."""
    from collections import defaultdict

    from readur_spark.operators.dedup import _pair_spans, _winnow_py

    docs = _load_documents(sf_dir)
    heldout = [(d, t) for d, t in docs if d % eval_mod == 0]
    eval_fp = defaultdict(list)
    for eid, text in heldout:
        for fp, pos in _winnow_py(text or "", k, window):
            eval_fp[fp].append((eid, pos))
    texts_e = dict(heldout)
    per_doc_spans = defaultdict(list)
    per_doc_evals = defaultdict(set)
    per_doc_nspans = defaultdict(int)
    for cid, text in docs:
        seeds = defaultdict(set)
        for fp, pos in _winnow_py(text or "", k, window):
            for eid, epos in eval_fp.get(fp, ()):
                if eid != cid:
                    seeds[eid].add((pos, epos))
        for eid, sd in seeds.items():
            spans, _truncated = _pair_spans(
                text, texts_e[eid], sorted(sd), k, min_len
            )
            if spans:
                per_doc_evals[cid].add(eid)
                per_doc_nspans[cid] += len(spans)
                per_doc_spans[cid].extend((sa, sa + ln) for sa, _sb, ln in spans)
    out = []
    for cid, intervals in per_doc_spans.items():
        covered, end = 0, -1
        for s, e in sorted(intervals):
            covered += max(0, e - max(s, end))
            end = max(end, e)
        out.append((cid, len(per_doc_evals[cid]), per_doc_nspans[cid], covered))
    return sorted(out)


def semdedup_expected(
    sf_dir: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 5,
):
    """Driver-side replay of operators/similarity.semdedup: same seeded
    k-means (portable md5 sample order), same first-min cluster rule,
    same ids-ascending greedy leader scan with round(.,6) on the max
    cosine. Returns sorted kept vec_ids."""
    import numpy as np

    ids, vecs, _cent, cluster = _kmeans_replay(
        sf_dir, n_clusters, seed, sample_size, n_iter
    )
    by_cluster: dict[int, list[int]] = {}
    for i, v in zip(ids, vecs):
        by_cluster.setdefault(cluster(v), []).append(i)
    vec_of = dict(zip(ids, vecs))
    kept = []
    for c, members in by_cluster.items():
        kept_unit = []
        for i in sorted(members):
            v = np.asarray(vec_of[i], dtype=np.float64)
            nv = np.sqrt((v * v).sum()) or 1.0
            u = v / nv
            if kept_unit and round(float(max(ku @ u for ku in kept_unit)), 6) > threshold:
                continue
            kept_unit.append(u)
            kept.append(i)
    return sorted((i,) for i in kept)


def quality_classifier_expected(
    sf_dir: str,
    num_buckets: int = 512,
    iters: int = 15,
    lr: float = 2.0,
    l2: float = 1e-4,
):
    """Sequential replay of train_quality_classifier + score_quality with
    pos = lang=='en', neg = others — the driver-oracle truth for
    `quality_classifier_scores`. Mirrors the operator's determinism
    contract exactly: md5-bucket features (DSIR construction), per-doc
    probability folded over buckets ascending in float64, gradient
    addends quantized to DECIMAL(30,15) HALF_UP and summed exactly,
    float Python weight updates, final probability rounded half-up to
    6 dp. Returns (rows, losses): rows = [(doc_id, quality_prob)]."""
    import hashlib
    import math
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    word_re = _re.compile(r"[^a-z0-9]+")

    def feats(text):
        words = [w for w in word_re.split((text or "").lower()) if w]
        counts: dict[int, int] = {}
        for w in words:
            b = (
                int(
                    hashlib.md5((w + ":dsir-v1").encode()).hexdigest()[:8],
                    16,
                )
                % num_buckets
            )
            counts[b] = counts.get(b, 0) + 1
        return sorted(counts.items()), len(words)

    data = []
    for doc_id, text, lang in docs:
        fs, total = feats(text)
        if total == 0:
            continue
        data.append((int(doc_id), fs, total, 1.0 if lang == "en" else 0.0))

    def _stable_sigmoid(acc):
        if acc >= 0.0:
            return 1.0 / (1.0 + math.exp(-acc))
        e = math.exp(acc)
        return e / (1.0 + e)

    q15 = Decimal("1e-15")

    def dec15(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q15, rounding=ROUND_HALF_UP)

    w = [0.0] * num_buckets
    bias = 0.0
    n = len(data)
    losses = []
    for _ in range(iters):
        grad = [Decimal(0)] * num_buckets
        gb = Decimal(0)
        loss = Decimal(0)
        for _id, fs, total, y in data:
            acc = bias
            t = float(total)
            for b, c in fs:
                acc += (c / t) * w[b]
            p = min(max(_stable_sigmoid(acc), 1e-12), 1.0 - 1e-12)
            err = p - y
            for b, c in fs:
                grad[b] += dec15(err * c / t)
            gb += dec15(err)
            loss += dec15(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)))
        losses.append(round(float(loss) / n, 9))
        w = [
            wi - lr * (float(gi) / n + l2 * wi) for wi, gi in zip(w, grad)
        ]
        bias -= lr * (float(gb) / n)

    q6 = Decimal("1e-6")
    rows = []
    for _id, fs, total, _y in data:
        acc = bias
        t = float(total)
        for b, c in fs:
            acc += (c / t) * w[b]
        p = _stable_sigmoid(acc)
        rows.append(
            (_id, float(Decimal(repr(p)).quantize(q6, rounding=ROUND_HALF_UP)))
        )
    return rows, losses
