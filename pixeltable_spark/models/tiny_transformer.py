"""A REAL transformer encoder in pure numpy — forward AND backward — for
the offline sentence-embedding path.

Architecture (the standard pre-LN encoder, Vaswani et al. 2017 with the
pre-norm arrangement of Xiong et al. 2020; the shape of MiniLM-class
sentence encoders):

    tok_emb + sinusoidal positions
    L x [ x += MHA(LN1(x));  x += FFN(LN2(x)) ]      (FFN = GELU MLP)
    LN_f -> masked-mean pool -> L2 normalize

Training is masked-language-modeling (Devlin et al. 2018): mask 15% of
tokens, predict them through the tied embedding matrix, cross-entropy,
Adam. Every gradient is hand-derived numpy (attention softmax, LayerNorm,
GELU, tied embeddings) and pinned by a numerical gradient check in
tests/test_tiny_transformer.py.

This is the "real architecture, in-repo weights" model the offline
`sentence_transformer` path resolves to (functions/huggingface.py):
reference parity for functions/huggingface.py:32, which runs downloaded
sentence-transformers weights — here the weights are trained in-repo
from the deterministic seed corpus and shipped as an .npz (see
tools/train_tiny_encoder.py), so the forward pass at inference is the
genuine article with zero downloads.

Scale note: inference is driver-side or inside a pandas UDF with the
(kilobyte-scale) weights broadcast — one matmul chain per batch; no
shuffle. Training is bounded driver work like pq_train / lsa_train.
"""

from __future__ import annotations

import math
import re

import numpy as np

PAD, UNK, MASK = "[PAD]", "[UNK]", "[MASK]"
_TOK = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in _TOK.split((text or "").lower()) if t]


def _gelu(x):
    # tanh approximation (the BERT gelu)
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x ** 3)))


def _gelu_grad(x):
    c = math.sqrt(2.0 / math.pi)
    u = c * (x + 0.044715 * x ** 3)
    t = np.tanh(u)
    du = c * (1.0 + 3 * 0.044715 * x ** 2)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t ** 2) * du


def _sinusoid(L: int, d: int) -> np.ndarray:
    pos = np.arange(L)[:, None].astype(np.float64)
    i = np.arange(d)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
    enc = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return enc


def _ln_forward(x, g, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * g + b, (xhat, inv, g)


def _ln_backward(dy, cache):
    xhat, inv, g = cache
    dg = (dy * xhat).sum(axis=tuple(range(dy.ndim - 1)))
    db = dy.sum(axis=tuple(range(dy.ndim - 1)))
    dxhat = dy * g
    dx = (dxhat - dxhat.mean(axis=-1, keepdims=True)
          - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True)) * inv
    return dx, dg, db


class TinyTransformer:
    """Pure-numpy pre-LN transformer encoder with MLM training."""

    def __init__(self, vocab: dict[str, int], dim: int = 32,
                 n_layers: int = 2, n_heads: int = 4, ffn_mult: int = 2,
                 max_len: int = 32, seed: int = 0):
        assert dim % n_heads == 0
        self.vocab = vocab
        self.inv_vocab = {i: w for w, i in vocab.items()}
        self.dim, self.n_layers, self.n_heads = dim, n_layers, n_heads
        self.dh = dim // n_heads
        self.max_len = max_len
        rng = np.random.RandomState(seed)
        V = len(vocab)
        s = 0.02
        self.P: dict[str, np.ndarray] = {
            "E": rng.normal(0, s, (V, dim)),
            "lnf_g": np.ones(dim), "lnf_b": np.zeros(dim),
            "b_out": np.zeros(V),
        }
        for li in range(n_layers):
            for nm in ("Wq", "Wk", "Wv", "Wo", ):
                self.P[f"{li}.{nm}"] = rng.normal(0, s, (dim, dim))
            self.P[f"{li}.W1"] = rng.normal(0, s, (dim, dim * ffn_mult))
            self.P[f"{li}.b1"] = np.zeros(dim * ffn_mult)
            self.P[f"{li}.W2"] = rng.normal(0, s, (dim * ffn_mult, dim))
            self.P[f"{li}.b2"] = np.zeros(dim)
            for nm in ("ln1", "ln2"):
                self.P[f"{li}.{nm}_g"] = np.ones(dim)
                self.P[f"{li}.{nm}_b"] = np.zeros(dim)
        self.pos = _sinusoid(max_len, dim)

    # -- forward -----------------------------------------------------------

    def _encode_ids(self, ids: np.ndarray, attn_mask: np.ndarray,
                    want_cache: bool = False):
        """ids: (B, L) int; attn_mask: (B, L) 1 for real tokens.
        Returns final hidden states (B, L, d) (+ cache for backward)."""
        P = self.P
        B, L = ids.shape
        x = P["E"][ids] + self.pos[None, :L, :]
        neg = (1.0 - attn_mask)[:, None, None, :] * -1e9  # (B,1,1,L)
        caches = []
        for li in range(self.n_layers):
            xn, ln1c = _ln_forward(x, P[f"{li}.ln1_g"], P[f"{li}.ln1_b"])
            Q = xn @ P[f"{li}.Wq"]
            K = xn @ P[f"{li}.Wk"]
            Vv = xn @ P[f"{li}.Wv"]

            def _heads(t):
                return t.reshape(B, L, self.n_heads, self.dh) \
                    .transpose(0, 2, 1, 3)  # (B,H,L,dh)

            Qh, Kh, Vh = _heads(Q), _heads(K), _heads(Vv)
            S = Qh @ Kh.transpose(0, 1, 3, 2) / math.sqrt(self.dh) + neg
            S = S - S.max(axis=-1, keepdims=True)
            A = np.exp(S)
            A = A / A.sum(axis=-1, keepdims=True)  # (B,H,L,L)
            ctx = A @ Vh  # (B,H,L,dh)
            ctx2 = ctx.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
            att = ctx2 @ P[f"{li}.Wo"]
            x1 = x + att
            yn, ln2c = _ln_forward(x1, P[f"{li}.ln2_g"], P[f"{li}.ln2_b"])
            h_pre = yn @ P[f"{li}.W1"] + P[f"{li}.b1"]
            h = _gelu(h_pre)
            ffn = h @ P[f"{li}.W2"] + P[f"{li}.b2"]
            x2 = x1 + ffn
            if want_cache:
                caches.append((x, xn, ln1c, Qh, Kh, Vh, A, ctx2,
                               x1, yn, ln2c, h_pre, h))
            x = x2
        xf, lnfc = _ln_forward(x, P["lnf_g"], P["lnf_b"])
        if want_cache:
            return xf, (caches, lnfc, ids, attn_mask)
        return xf

    # -- backward (MLM loss) ----------------------------------------------

    def _mlm_loss_and_grads(self, ids, attn_mask, target_ids, loss_mask):
        """Cross-entropy at masked positions, predictions through the
        tied embedding matrix. Returns (loss, grads dict)."""
        P = self.P
        B, L = ids.shape
        xf, (caches, lnfc, _, _) = self._encode_ids(ids, attn_mask,
                                                    want_cache=True)
        logits = xf @ P["E"].T + P["b_out"]  # (B,L,V)
        logits -= logits.max(axis=-1, keepdims=True)
        expz = np.exp(logits)
        probs = expz / expz.sum(axis=-1, keepdims=True)
        n_mask = max(1, int(loss_mask.sum()))
        picked = probs[np.arange(B)[:, None], np.arange(L)[None, :],
                       target_ids]
        loss = -(np.log(np.maximum(picked, 1e-12)) * loss_mask).sum() / n_mask
        # dlogits
        dlogits = probs.copy()
        dlogits[np.arange(B)[:, None], np.arange(L)[None, :],
                target_ids] -= 1.0
        dlogits *= (loss_mask / n_mask)[:, :, None]
        g = {k: np.zeros_like(v) for k, v in P.items()}
        g["b_out"] = dlogits.sum(axis=(0, 1))
        g["E"] += dlogits.reshape(-1, dlogits.shape[-1]).T @ \
            xf.reshape(-1, self.dim)
        dxf = dlogits @ P["E"]
        dx, dg_, db_ = _ln_backward(dxf, lnfc)
        g["lnf_g"] += dg_
        g["lnf_b"] += db_
        for li in range(self.n_layers - 1, -1, -1):
            (x, xn, ln1c, Qh, Kh, Vh, A, ctx2,
             x1, yn, ln2c, h_pre, h) = caches[li]
            # x2 = x1 + ffn
            dffn = dx
            dx1 = dx.copy()
            g[f"{li}.W2"] += h.reshape(-1, h.shape[-1]).T @ \
                dffn.reshape(-1, self.dim)
            g[f"{li}.b2"] += dffn.sum(axis=(0, 1))
            dh = dffn @ P[f"{li}.W2"].T
            dh_pre = dh * _gelu_grad(h_pre)
            g[f"{li}.W1"] += yn.reshape(-1, self.dim).T @ \
                dh_pre.reshape(-1, dh_pre.shape[-1])
            g[f"{li}.b1"] += dh_pre.sum(axis=(0, 1))
            dyn = dh_pre @ P[f"{li}.W1"].T
            dx1_ln, dg2, db2 = _ln_backward(dyn, ln2c)
            g[f"{li}.ln2_g"] += dg2
            g[f"{li}.ln2_b"] += db2
            dx1 += dx1_ln
            # x1 = x + att
            datt = dx1
            dxres = dx1.copy()
            g[f"{li}.Wo"] += ctx2.reshape(-1, self.dim).T @ \
                datt.reshape(-1, self.dim)
            dctx2 = datt @ P[f"{li}.Wo"].T
            B_, L_ = x.shape[0], x.shape[1]
            dctx = dctx2.reshape(B_, L_, self.n_heads, self.dh) \
                .transpose(0, 2, 1, 3)
            dA = dctx @ Vh.transpose(0, 1, 3, 2)
            dVh = A.transpose(0, 1, 3, 2) @ dctx
            dS = (dA - (dA * A).sum(axis=-1, keepdims=True)) * A
            dS = dS / math.sqrt(self.dh)
            dQh = dS @ Kh
            dKh = dS.transpose(0, 1, 3, 2) @ Qh

            def _unheads(t):
                return t.transpose(0, 2, 1, 3).reshape(B_, L_, self.dim)

            dQ, dK, dV = _unheads(dQh), _unheads(dKh), _unheads(dVh)
            xn2 = xn.reshape(-1, self.dim)
            g[f"{li}.Wq"] += xn2.T @ dQ.reshape(-1, self.dim)
            g[f"{li}.Wk"] += xn2.T @ dK.reshape(-1, self.dim)
            g[f"{li}.Wv"] += xn2.T @ dV.reshape(-1, self.dim)
            dxn = (dQ @ P[f"{li}.Wq"].T + dK @ P[f"{li}.Wk"].T
                   + dV @ P[f"{li}.Wv"].T)
            dx_ln, dg1, db1 = _ln_backward(dxn, ln1c)
            g[f"{li}.ln1_g"] += dg1
            g[f"{li}.ln1_b"] += db1
            dx = dxres + dx_ln
        # embedding input grad (scatter-add over token ids)
        np.add.at(g["E"], ids.reshape(-1), dx.reshape(-1, self.dim))
        return loss, g

    # -- training ----------------------------------------------------------

    def train_mlm(self, texts: list[str], epochs: int = 60,
                  lr: float = 1e-3, mask_frac: float = 0.15,
                  batch_size: int = 64, seed: int = 1,
                  verbose: bool = False) -> list[float]:
        """Adam-optimized MLM over whitespace-ish tokenized texts.
        Deterministic for a fixed seed. Returns per-epoch losses."""
        rng = np.random.RandomState(seed)
        seqs = [[self.vocab.get(t, self.vocab[UNK]) for t in tokenize(x)]
                [:self.max_len] for x in texts]
        seqs = [s for s in seqs if len(s) >= 2]
        mstate = {k: np.zeros_like(v) for k, v in self.P.items()}
        vstate = {k: np.zeros_like(v) for k, v in self.P.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8
        step = 0
        losses = []
        for ep in range(epochs):
            order = rng.permutation(len(seqs))
            ep_loss, nb = 0.0, 0
            for bs in range(0, len(order), batch_size):
                batch = [seqs[i] for i in order[bs:bs + batch_size]]
                L = max(len(s) for s in batch)
                ids = np.full((len(batch), L), self.vocab[PAD],
                              dtype=np.int64)
                am = np.zeros((len(batch), L))
                for i, s in enumerate(batch):
                    ids[i, :len(s)] = s
                    am[i, :len(s)] = 1.0
                target = ids.copy()
                pick = (rng.rand(*ids.shape) < mask_frac) & (am > 0)
                # ensure at least one masked position per batch
                if not pick.any():
                    pick[0, 0] = am[0, 0] > 0
                inp = ids.copy()
                inp[pick] = self.vocab[MASK]
                loss, g = self._mlm_loss_and_grads(
                    inp, am, target, pick.astype(np.float64))
                step += 1
                for k in self.P:
                    mstate[k] = b1 * mstate[k] + (1 - b1) * g[k]
                    vstate[k] = b2 * vstate[k] + (1 - b2) * g[k] ** 2
                    mhat = mstate[k] / (1 - b1 ** step)
                    vhat = vstate[k] / (1 - b2 ** step)
                    self.P[k] -= lr * mhat / (np.sqrt(vhat) + eps)
                ep_loss += loss
                nb += 1
            losses.append(ep_loss / max(nb, 1))
            if verbose and ep % 10 == 0:
                print(f"epoch {ep}: mlm loss {losses[-1]:.4f}")
        return losses

    # -- inference ---------------------------------------------------------

    def encode(self, text: str) -> list[float]:
        """Sentence embedding: masked-mean pool of the final hidden
        states, L2-normalized. All-OOV/empty -> zero vector."""
        toks = tokenize(text)
        ids = [self.vocab.get(t, self.vocab[UNK]) for t in toks]
        ids = ids[:self.max_len]
        if not ids:
            return [0.0] * self.dim
        a = np.ones((1, len(ids)))
        xf = self._encode_ids(np.array([ids], dtype=np.int64), a)
        v = xf[0].mean(axis=0)
        n = float(np.linalg.norm(v))
        if n == 0:
            return [0.0] * self.dim
        return [float(x) for x in v / n]

    def similarity(self, a: str, b: str) -> float:
        va, vb = self.encode(a), self.encode(b)
        return float(sum(x * y for x, y in zip(va, vb)))

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        meta = np.array([self.dim, self.n_layers, self.n_heads,
                         self.max_len], dtype=np.int64)
        words = np.array(sorted(self.vocab, key=self.vocab.get))
        np.savez_compressed(path, __meta__=meta, __words__=words,
                            **{k.replace(".", "__"): v
                               for k, v in self.P.items()})

    @classmethod
    def load(cls, path: str) -> "TinyTransformer":
        z = np.load(path, allow_pickle=False)
        dim, n_layers, n_heads, max_len = (int(x) for x in z["__meta__"])
        vocab = {str(w): i for i, w in enumerate(z["__words__"])}
        m = cls(vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
                max_len=max_len)
        for k in list(m.P):
            m.P[k] = z[k.replace(".", "__")]
        return m


def build_vocab(texts: list[str], max_size: int = 4000) -> dict[str, int]:
    """[PAD]/[UNK]/[MASK] + the most frequent corpus tokens
    (count desc, word asc — deterministic)."""
    freq: dict[str, int] = {}
    for t in texts:
        for w in tokenize(t):
            freq[w] = freq.get(w, 0) + 1
    words = [w for w, _ in sorted(freq.items(),
                                  key=lambda kv: (-kv[1], kv[0]))]
    vocab = {PAD: 0, UNK: 1, MASK: 2}
    for w in words[:max_size]:
        vocab[w] = len(vocab)
    return vocab
