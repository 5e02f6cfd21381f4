"""LLM tail: TXT2KG parsing, LLMJudge scoring, DocumentRetriever,
MoleculeGPT / GIT-Mol graph towers (reference ``torch_geometric/llm``)."""
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.llm import (DocumentRetriever, GITMol,
                                       LLMJudge, MoleculeGPT, TXT2KG,
                                       chunk_text, merge_triples,
                                       parse_n_check_triples)

rng = np.random.default_rng(0)


def test_parse_triples_line_format():
    s = "('paris', 'capital of', 'france')\n('berlin', 'capital of', " \
        "'germany')\nnote: these are the triples"
    out = parse_n_check_triples(s)
    assert ('paris', 'capital of', 'france') in out
    assert ('berlin', 'capital of', 'germany') in out
    assert all(len(t) == 3 for t in out)


def test_parse_triples_runon_format():
    s = "(paris, capital of, france) (lyon, city in, france)"
    out = parse_n_check_triples(s)
    assert ('paris', 'capital of', 'france') in out
    assert ('lyon', 'city in', 'france') in out


def test_parse_triples_rejects_malformed():
    s = "(only, two)\n(, empty, part)\n(a, b, c, d)\n(x, y, z)"
    out = parse_n_check_triples(s)
    assert out == [('x', 'y', 'z')]


def test_chunk_and_merge():
    text = 'One sentence. ' * 100
    chunks = chunk_text(text, chunk_size=128)
    assert all(len(c) <= 128 for c in chunks)
    assert sum(len(c) for c in chunks) >= len(text.strip()) - len(chunks)
    merged = merge_triples([[('a', 'b', 'c')], [('a', 'b', 'c'),
                                                ('d', 'e', 'f')]])
    assert merged == [('a', 'b', 'c'), ('d', 'e', 'f')]


def test_txt2kg_with_stub_llm():
    kg = TXT2KG(triples_fn=lambda txt: "('x', 'rel', 'y')\n"
                                       "('y', 'rel', 'z')",
                chunk_size=64)
    kg.add_doc_2_KG('Some document. ' * 10, QA_pair=('q?', 'a'))
    assert kg.relevant_triples[('q?', 'a')] == [('x', 'rel', 'y'),
                                                ('y', 'rel', 'z')]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'kg.json')
        kg.save_kg(p)
        kg2 = TXT2KG()
        kg2.load_kg(p)
        assert kg2.relevant_triples == kg.relevant_triples


def test_llm_judge():
    judge = LLMJudge(call_fn=lambda prompt: 'The rating is 4')
    assert judge.score('q', 'pred', 'ref') == 1.0
    judge = LLMJudge(call_fn=lambda prompt: '2')
    assert judge.score('q', 'pred', 'ref') == 0.5
    judge = LLMJudge(call_fn=lambda prompt: 'garbage')
    assert judge.score('q', 'pred', 'ref') == 0.0


def test_document_retriever():
    docs = ['apple pie', 'banana bread', 'carrot cake', 'date shake']
    emb = np.eye(4, 8, dtype=np.float32)

    def encoder(q, **kw):
        if isinstance(q, list):
            return emb
        return emb[2] + 0.01  # closest to 'carrot cake'

    r = DocumentRetriever(docs, k_for_docs=2, model=encoder)
    got = r.query('something carroty')
    assert got[0] == 'carrot cake' and len(got) == 2
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'store')
        r.save(p)
        r2 = DocumentRetriever.load(p, model=encoder)
        assert r2.query('x')[0] == 'carrot cake'


def _mol_batch(n=12, e=30, b=2):
    x = jnp.asarray(np.stack([rng.integers(0, 100, n),
                              rng.integers(0, 3, n)], 1))
    coo = jnp.asarray(np.stack([rng.integers(0, n, e),
                                rng.integers(0, n, e)]).astype(np.int32))
    ea = jnp.asarray(np.stack([rng.integers(0, 6, e),
                               rng.integers(0, 3, e)], 1))
    batch = jnp.asarray(np.sort(rng.integers(0, b, n)).astype(np.int32))
    return x, coo, ea, batch


def test_molecule_gpt_encode():
    x, coo, ea, batch = _mol_batch()
    m = MoleculeGPT(graph_channels=8, mlp_out_channels=8, max_tokens=4,
                    llm_embed_dim=16, smiles_dim=12)
    smiles_emb = jnp.asarray(
        rng.standard_normal((2, 12)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, coo, batch, ea, smiles_emb,
               batch_size=2)
    out = m.apply(p, x, coo, batch, ea, smiles_emb, batch_size=2)
    assert out.shape == (2, 16)
    assert bool(jnp.isfinite(out).all())


def test_gitmol_embeddings_and_loss():
    x, coo, ea, batch = _mol_batch()
    m = GITMol(graph_channels=8, embed_dim=16)
    text_emb = jnp.asarray(
        rng.standard_normal((2, 24)).astype(np.float32))
    img_emb = jnp.asarray(
        rng.standard_normal((2, 10)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, coo, batch, ea, text_emb,
               img_emb, batch_size=2)
    zg, zt, zi = m.apply(p, x, coo, batch, ea, text_emb, img_emb,
                         batch_size=2)
    for z in (zg, zt, zi):
        assert z.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                                   1.0, atol=1e-5)
    loss = GITMol.xtc_loss(zg, zt)
    assert np.isfinite(float(loss))
