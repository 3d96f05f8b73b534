"""LSA embeddings (operators/lsa.py): a real locally-trained semantic
model — synonyms that share contexts but never share a token must land
near each other, which the BoW random projection cannot do."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.lsa import LsaModel, lsa_embeddings, lsa_train

# synonym groups, each with its OWN context set: group members share
# contexts with each other (the LSA signal) but different groups see
# different words, so only true synonyms end up distributionally close
SYN_GROUPS = {
    ("cat", "feline"): [
        "the {} sat quietly washing its soft fur",
        "a hungry {} chased the mouse into the barn",
        "our {} purred loudly on the warm windowsill",
        "that {} scratched the post and ignored the toy",
        "the {} stalked birds along the garden fence",
        "my {} naps all afternoon in the sun",
    ],
    ("boat", "vessel"): [
        "the {} sailed slowly across the calm harbor",
        "a fishing {} anchored beyond the rocky pier",
        "the {} rocked gently on the evening tide",
        "that old {} needs new paint below the waterline",
        "the {} docked at dawn with a full catch",
        "a small {} drifted past the lighthouse",
    ],
    ("car", "automobile"): [
        "the {} accelerated onto the crowded highway",
        "a red {} parked outside the repair garage",
        "his {} stalled at the traffic light again",
        "the {} needs an oil change and new tires",
        "that {} gets excellent mileage on long drives",
        "she washed the {} in the driveway sunday",
    ],
    ("house", "dwelling"): [
        "the {} has a brick chimney and green shutters",
        "an old {} stood empty at the end of the lane",
        "their {} was renovated with a modern kitchen",
        "the {} overlooks a quiet valley to the west",
        "every {} on the street has a small porch",
        "that {} sold quickly despite the leaky roof",
    ],
}


def _corpus():
    rows = []
    i = 0
    for grp, contexts in SYN_GROUPS.items():
        for w in grp:
            for ctx in contexts:
                rows.append((i, ctx.format(w)))
                i += 1
    return rows


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    return lsa_train(df, "text", dim=16, vocab_size=200, window=4)


class TestLsaSemantics:
    def test_synonym_recall_beats_bow(self, model):
        """recall@3 of the synonym partner among all vocab words: LSA
        must score (near-)perfect; the BoW projection is chance-level
        (distinct tokens embed independently)."""
        from pixeltable_spark.operators.similarity import bow_embedding_py
        words = sorted(model.vectors)

        def recall(encode):
            hits = 0
            pairs = [(a, b) for g in SYN_GROUPS for a in g for b in g
                     if a != b]  # both directions per group
            for a, b in pairs:
                va = encode(a)
                sims = []
                for w in words:
                    if w == a:
                        continue
                    vw = encode(w)
                    sims.append((sum(x * y for x, y in zip(va, vw)), w))
                top = [w for _, w in sorted(sims, reverse=True)[:3]]
                hits += b in top
            return hits / len(pairs)

        lsa_rec = recall(model.encode)
        bow_rec = recall(lambda t: bow_embedding_py(t, 16))
        assert lsa_rec >= 0.8, f"LSA synonym recall@3 only {lsa_rec}"
        assert lsa_rec > bow_rec + 0.3, (lsa_rec, bow_rec)

    def test_paraphrase_closer_than_unrelated(self, model):
        para = model.similarity("the cat washed its fur",
                                "the feline washed its fur")
        unrel = model.similarity("the cat washed its fur",
                                 "the vessel anchored beyond the pier")
        assert para > unrel

    def test_encode_unit_norm_and_oov(self, model):
        v = model.encode("the cat sat")
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
        assert model.encode("zzz qqq xyzzy") == [0.0] * model.dim
        assert model.encode("") == [0.0] * model.dim

    def test_model_is_deterministic(self, spark, model):
        df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
        m2 = lsa_train(df, "text", dim=16, vocab_size=200, window=4)
        assert m2.vectors.keys() == model.vectors.keys()
        for w in model.vectors:
            assert all(math.isclose(a, b, abs_tol=1e-9)
                       for a, b in zip(m2.vectors[w], model.vectors[w]))


class TestLsaDataFrame:
    def test_lsa_embeddings_matches_encode(self, spark, model):
        df = spark.createDataFrame(_corpus()[:20], ["doc_id", "text"])
        out = {r["doc_id"]: r["embedding"]
               for r in lsa_embeddings(df, model).collect()}
        for doc_id, text in _corpus()[:20]:
            exp = model.encode(text)
            assert all(math.isclose(a, b, abs_tol=1e-9)
                       for a, b in zip(out[doc_id], exp))

    def test_sentence_transformer_local_model(self, spark, model):
        """The distributed-safe kwarg path: the model ships by value with
        the expression; embeddings computed on executors match encode()."""
        import pixeltable_spark as pxt
        from pixeltable_spark.functions.huggingface import sentence_transformer
        rows = _corpus()[:8]
        t = pxt.table_from_rows(spark, [{"doc_id": i, "text": s}
                                        for i, s in rows], name="lsa_t")
        res = t.select(t.doc_id,
                       emb=sentence_transformer(
                           t.text, model_id="lsa-local",
                           local_model=model)).collect()
        got = {r["doc_id"]: list(r["emb"]) for r in res}
        for i, s in rows:
            exp = model.encode(s)
            assert all(math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
                       for a, b in zip(got[i], exp))

    def test_empty_corpus(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string")
        m = lsa_train(df, "text", dim=8, vocab_size=50)
        assert isinstance(m, LsaModel) and m.vectors == {}
