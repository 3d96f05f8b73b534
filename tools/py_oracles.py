"""Pure-python/numpy replay oracles for the five queries whose
algorithms are not SQL-expressible (q70 PQ-ANN, q88 SemDeDup, q91 BPE,
q92 LSA, q95 ICWS). Each function loads the same parquet inputs with
pandas/pyarrow and re-derives the expected output from the published
algorithm spec — independently of the Spark operators — so
tools/check_correctness.py can assert VALUES, not just row counts.

Everything here is deterministic: md5/xxhash64-seeded draws, fixed
iteration counts, lexicographic tie-breaks, and the same left-to-right
float accumulation order the JVM fold uses (float addition is not
associative; matching the order makes cells compare exactly, not just
within tolerance).
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xxh64 import xxh64_signed  # noqa: E402


def _round6(x: float) -> float:
    """Spark F.round(x, 6): BigDecimal(Double.toString(x)) HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"),
                                                  rounding=ROUND_HALF_UP))


def _read(sf_dir: str, table: str):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet")).to_pandas()


# Java \s (ASCII whitespace incl. \x0b); python \s is unicode-wide
_JWS = "[ \\t\\n\\x0b\\f\\r]+"


def _ws_tokens(text: str) -> list[str]:
    """split(lower(trim(text)), \\s+) with non-empty filter — the
    term_freqs / BPE-training tokenizer."""
    return [t for t in re.split(_JWS, text.strip(" ").lower()) if t]


# ---------------------------------------------------------------------------
# q70: PQ-ANN (pq_train m=8 k=16 iters=5 -> encode -> ADC top-100 ->
# exact cosine rerank top-10)
# ---------------------------------------------------------------------------

_QUERY_VEC = [round(((i * 37) % 19 - 9) / 10.0, 1) for i in range(64)]


def _md5_order(ids) -> list[int]:
    """Row order of orderBy(md5(cast(id as string)))."""
    return sorted(range(len(ids)),
                  key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest())


def _lloyd(X, k: int, iters: int):
    import numpy as np

    n = len(X)
    cent = X[:: max(1, n // k)][:k].copy()
    if len(cent) < k:
        cent = np.resize(cent, (k, X.shape[1]))
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = X[mask].mean(axis=0)
    return cent


def q70_pq_ann(sf_dir: str):
    import numpy as np

    pdf = _read(sf_dir, "embeddings")
    ids = pdf["vec_id"].tolist()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    order = _md5_order(ids)
    Xs = X[order][:10_000]
    m, k, iters = 8, 16, 5
    d = X.shape[1]
    sub = d // m
    books = np.empty((m, k, sub))
    for mi in range(m):
        books[mi] = _lloyd(Xs[:, mi * sub:(mi + 1) * sub], k, iters)
    # encode all vectors
    codes = np.empty((len(X), m), dtype=np.int64)
    for mi in range(m):
        seg = X[:, mi * sub:(mi + 1) * sub]
        d2 = ((seg[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
        codes[:, mi] = d2.argmin(axis=1)
    # ADC shortlist of 100: left-to-right float sum of LUT terms (the
    # JVM expression adds terms in subspace order)
    q = np.asarray(_QUERY_VEC, dtype=np.float64)
    lut = np.empty((m, k))
    for mi in range(m):
        lut[mi] = (((books[mi] - q[mi * sub:(mi + 1) * sub][None, :]) ** 2)
                   .sum(axis=1))
    adc = []
    for i in range(len(X)):
        acc = 0.0
        for mi in range(m):
            acc = acc + float(lut[mi][codes[i, mi]])
        adc.append((_round6(acc), ids[i]))
    short = sorted(adc, key=lambda t: (t[0], t[1]))[:100]
    short_ids = {vid for _, vid in short}
    # exact cosine rerank (left-fold dot and norms, like the JVM fold)
    out = []
    qn_acc = 0.0
    for x in _QUERY_VEC:
        qn_acc = qn_acc + float(x) * float(x)
    qn = math.sqrt(qn_acc)
    by_id = {vid: i for i, vid in enumerate(ids)}
    for vid in short_ids:
        v = X[by_id[vid]]
        dot = 0.0
        nn = 0.0
        for a, b in zip(v, _QUERY_VEC):
            dot = dot + float(a) * float(b)
        for a in v:
            nn = nn + float(a) * float(a)
        cos = dot / (math.sqrt(nn) * qn)
        out.append((vid, _round6(cos)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return ["vec_id", "cos"], [(vid, c) for vid, c in out[:10]]


# ---------------------------------------------------------------------------
# q88: SemDeDup (kmeans k=16 iters=5 -> argmin assign -> per-cluster
# greedy leader prune at cosine 0.9)
# ---------------------------------------------------------------------------

def q88_semdedup(sf_dir: str):
    import numpy as np

    pdf = _read(sf_dir, "embeddings")
    ids = pdf["vec_id"].tolist()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    order = _md5_order(ids)
    cent = _lloyd(X[order][:10_000], 16, 5)
    d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)
    rows = []
    for c in sorted(set(cluster.tolist())):
        idx = [i for i in range(len(ids)) if cluster[i] == c]
        idx.sort(key=lambda i: ids[i])
        Xc = X[idx]
        norms = np.linalg.norm(Xc, axis=1)
        norms[norms == 0] = 1.0
        U = Xc / norms[:, None]
        kept: list[int] = []
        for j, i in enumerate(idx):
            max_cos = -1.0
            if kept:
                sims = U[kept] @ U[j]
                max_cos = float(sims.max())
            keep = max_cos < 0.9
            if keep:
                kept.append(j)
            rows.append((ids[i], int(c), bool(keep),
                         float(np.round(max_cos, 6))))
    return ["vec_id", "cluster", "keep", "max_cos_kept"], rows


# ---------------------------------------------------------------------------
# q91: BPE train (64 merges over top-5000 words) + per-doc token counts
# ---------------------------------------------------------------------------

_EOW = "</w>"


def _bpe_train_replay(word_freqs: list, num_merges: int) -> list:
    vocab = {tuple(w) + (_EOW,): c for w, c in word_freqs}
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = "".join(best)
        nv: dict = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def _bpe_encode_len(word: str, ranks: dict) -> int:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i < 0:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


_WORD_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]")


def q91_bpe_tokenize(sf_dir: str):
    pdf = _read(sf_dir, "documents")
    freqs: dict = {}
    for t in pdf["text"]:
        for w in _ws_tokens(t):
            freqs[w] = freqs.get(w, 0) + 1
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:5000]
    merges = _bpe_train_replay(top, 64)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rows = []
    memo: dict = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        # the encode UDF tokenizes with python str.split() (unicode ws),
        # unlike the Java-\s training tokenizer — replicate exactly
        n_bpe = 0
        for w in text.lower().strip().split():
            ln = memo.get(w)
            if ln is None:
                ln = memo[w] = _bpe_encode_len(w, ranks)
            n_bpe += ln
        n_regex = len(_WORD_RE.findall(text))
        rows.append((int(doc_id), n_bpe, n_regex))
    return ["doc_id", "n_bpe_tokens", "n_regex_tokens"], rows


# ---------------------------------------------------------------------------
# q92: LSA (PPMI + truncated SVD, dim=16 vocab=300 window=2) -> embed ->
# exact top-20 cosine to a fixed query sentence
# ---------------------------------------------------------------------------

_LSA_TOK = re.compile(r"[^a-z0-9]+")
_LSA_QUERY = ("data processing and analysis of large document "
              "collections")


def _lsa_tokens(text: str) -> list[str]:
    return [t for t in _LSA_TOK.split(text.strip(" ").lower()) if t]


def q92_lsa_semantic_dedup(sf_dir: str):
    import numpy as np

    pdf = _read(sf_dir, "documents")
    docs = [(int(i), _lsa_tokens(t))
            for i, t in zip(pdf["doc_id"], pdf["text"])]
    n_docs = len(docs)
    dim, vocab_size, window = 16, 300, 2
    df_counts: dict = {}
    for _, toks in docs:
        for w in set(toks):
            df_counts[w] = df_counts.get(w, 0) + 1
    top = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:vocab_size]
    vocab = {w: i for i, (w, _) in enumerate(top)}
    idf = {w: math.log((1 + n_docs) / (1 + c)) + 1.0 for w, c in top}
    V = len(vocab)
    M = np.zeros((V, V))
    for _, toks in docs:
        for o in range(1, window + 1):
            for i in range(len(toks) - o):
                a, b = vocab.get(toks[i]), vocab.get(toks[i + o])
                if a is not None and b is not None:
                    M[a, b] += 1
                    M[b, a] += 1
    total = M.sum()
    row = M.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(M * total / (row @ row.T))
    ppmi = np.where(np.isfinite(pmi), np.maximum(pmi, 0.0), 0.0)
    U, S, _ = np.linalg.svd(ppmi, full_matrices=False)
    k = min(dim, V)
    W = U[:, :k] * np.sqrt(S[:k])[None, :]
    if k < dim:
        W = np.pad(W, ((0, 0), (0, dim - k)))
    norms = np.linalg.norm(W, axis=1, keepdims=True)
    W = np.divide(W, norms, out=np.zeros_like(W), where=norms > 0)
    vectors = {w: [float(x) for x in W[i]] for w, i in vocab.items()}

    def encode(toks):
        acc = [0.0] * dim
        for t in toks:
            v = vectors.get(t)
            if v is None:
                continue
            w = idf.get(t, 1.0)
            for i in range(dim):
                acc[i] += w * v[i]
        n = math.sqrt(sum(x * x for x in acc))
        return acc if n == 0 else [x / n for x in acc]

    qvec = encode(_lsa_tokens(_LSA_QUERY))
    qn_acc = 0.0
    for x in qvec:
        qn_acc = qn_acc + float(x) * float(x)
    qn = math.sqrt(qn_acc)
    out = []
    for doc_id, toks in docs:
        e = encode(toks)
        dot = 0.0
        nn = 0.0
        for a, b in zip(e, qvec):
            dot = dot + float(a) * float(b)
        for a in e:
            nn = nn + float(a) * float(a)
        denom = math.sqrt(nn) * qn
        cos = dot / denom if denom else float("nan")
        out.append((doc_id, _round6(cos) if denom else None))
    out = [r for r in out if r[1] is not None]
    out.sort(key=lambda t: (-t[1], t[0]))
    return ["doc_id", "cos"], out[:20]


# ---------------------------------------------------------------------------
# q95: ICWS weighted-Jaccard pairs (K=12 samples, 4 rows/band, est>=0.75)
# ---------------------------------------------------------------------------

_TWO53 = 9007199254740992.0


def _icws_u(term: str, salt: str) -> float:
    h = xxh64_signed(salt + term)
    h53 = (h & ((1 << 64) - 1)) >> 11  # shiftrightunsigned
    return (float(h53) + 1.0) / _TWO53


def q95_icws_pairs(sf_dir: str):
    pdf = _read(sf_dir, "documents")
    K, rows_per_band, threshold = 12, 4, 0.75
    bands = K // rows_per_band
    # per-term draws are doc-independent: cache across the corpus
    draw_cache: dict = {}

    def draws(term: str, k: int):
        key = (term, k)
        d = draw_cache.get(key)
        if d is None:
            u1 = _icws_u(term, f"icws{k}u0|")
            u2 = _icws_u(term, f"icws{k}u1|")
            u3 = _icws_u(term, f"icws{k}u2|")
            u4 = _icws_u(term, f"icws{k}u3|")
            beta = _icws_u(term, f"icws{k}b|")
            r = -(math.log(u1) + math.log(u2))
            ln_c = math.log(-(math.log(u3) + math.log(u4)))
            d = draw_cache[key] = (r, ln_c, beta)
        return d

    sigs: dict = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        tf: dict = {}
        for t in _ws_tokens(text):
            tf[t] = tf.get(t, 0) + 1
        if not tf:
            continue
        sig = []
        for k in range(K):
            best = None
            for term, cnt in tf.items():
                r, ln_c, beta = draws(term, k)
                lnw = math.log(float(cnt))
                t_ = math.floor(lnw / r + beta)
                ln_y = r * (float(t_) - beta)
                ln_a = ln_c - ln_y - r
                cand = (ln_a, term, t_)
                if best is None or cand < best:
                    best = cand
            sig.append(f"{best[1]}|{best[2]}")
        sigs[int(doc_id)] = sig
    # banding: bucket docs by (band index, xxhash64 of the band's rows)
    buckets: dict = {}
    sig_hash = {i: [xxh64_signed(s) for s in sig] for i, sig in sigs.items()}
    for i, sig in sigs.items():
        for b in range(bands):
            key = xxh64_signed("\x1f".join(
                sig[b * rows_per_band + r] for r in range(rows_per_band)))
            buckets.setdefault((b, key), []).append(i)
    rows = []
    seen = set()
    for (b, _), members in sorted(buckets.items()):
        members = sorted(members)
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, ib = members[x], members[y]
                ha, hb = sig_hash[ia], sig_hash[ib]
                eq = [ha[i] == hb[i] for i in range(K)]
                # first agreeing band wins (dedup across bands)
                first = next((bi for bi in range(bands)
                              if all(eq[bi * rows_per_band + r]
                                     for r in range(rows_per_band))), -1)
                if first != b:
                    continue
                if (ia, ib) in seen:
                    continue
                seen.add((ia, ib))
                est = sum(eq) / float(K)
                if est >= threshold:
                    rows.append((ia, ib, _round6(est)))
    return ["id_a", "id_b", "est_wjaccard"], rows


PY_ORACLES = {
    "q70_pq_ann": q70_pq_ann,
    "q88_semdedup": q88_semdedup,
    "q91_bpe_tokenize": q91_bpe_tokenize,
    "q92_lsa_semantic_dedup": q92_lsa_semantic_dedup,
    "q95_icws_pairs": q95_icws_pairs,
}
