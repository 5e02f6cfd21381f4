"""GraphRAG / LLM stack (lite).

Reference: ``torch_geometric/llm/models/llm.py:51`` (LLM wrapper),
``g_retriever.py:10`` (GNN soft-prompt -> LLM),
``sentence_transformer.py``. The HF models load through ``transformers``
(baked into this image); the GNN encoder is ours; the projector maps
pooled graph embeddings into the LLM's input embedding space as soft
prompt tokens — the same architecture, torch-free on the graph side.
"""

from typing import Any, Callable, List, Optional

import numpy as np


class SentenceTransformer:
    """Mean-pooled HF encoder (reference
    ``llm/models/sentence_transformer.py``)."""

    def __init__(self, model_name: str = 'sentence-transformers/all-MiniLM-L6-v2',
                 device: str = 'cpu'):
        from transformers import AutoModel, AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name)
        self.model.eval()

    def encode(self, sentences: List[str],
               batch_size: int = 32) -> np.ndarray:
        import torch
        outs = []
        with torch.no_grad():
            for i in range(0, len(sentences), batch_size):
                batch = sentences[i:i + batch_size]
                toks = self.tokenizer(batch, padding=True,
                                      truncation=True,
                                      return_tensors='pt')
                h = self.model(**toks).last_hidden_state
                mask = toks['attention_mask'][..., None]
                emb = (h * mask).sum(1) / mask.sum(1).clamp(min=1)
                outs.append(emb.cpu().numpy())
        return np.concatenate(outs, 0)


class LLM:
    """Frozen causal LM wrapper (reference ``llm/models/llm.py:51``)."""

    def __init__(self, model_name: str, dtype: str = 'float32'):
        from transformers import AutoModelForCausalLM, AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForCausalLM.from_pretrained(model_name)
        self.model.eval()

    @property
    def word_embedding_dim(self) -> int:
        return self.model.get_input_embeddings().weight.shape[1]

    def inference(self, question: List[str], max_tokens: int = 32,
                  soft_prompt: Optional[np.ndarray] = None) -> List[str]:
        """Generate answers, optionally prefixing per-sample soft-prompt
        embeddings (the G-Retriever injection point)."""
        import torch
        outs = []
        emb_layer = self.model.get_input_embeddings()
        for i, q in enumerate(question):
            toks = self.tokenizer(q, return_tensors='pt')
            tok_emb = emb_layer(toks['input_ids'])
            if soft_prompt is not None:
                sp = torch.as_tensor(
                    np.asarray(soft_prompt[i]),
                    dtype=tok_emb.dtype)[None]
                tok_emb = torch.cat([sp, tok_emb], dim=1)
            with torch.no_grad():
                gen = self.model.generate(
                    inputs_embeds=tok_emb, max_new_tokens=max_tokens,
                    do_sample=False,
                    pad_token_id=self.tokenizer.eos_token_id)
            outs.append(self.tokenizer.decode(gen[0],
                                              skip_special_tokens=True))
        return outs


class GRetriever:
    """GNN soft-prompt + LLM (reference ``llm/models/g_retriever.py:10``).

    ``gnn_encode(x, edge_index) -> [N, D]`` is any of our jax models
    wrapped in a callable; the projector is a numpy linear map trained
    separately (kept simple: the architecture contract, not the full
    trainer)."""

    def __init__(self, llm: LLM, gnn_encode: Callable,
                 gnn_out_dim: int, num_prompt_tokens: int = 1,
                 seed: int = 0):
        self.llm = llm
        self.gnn_encode = gnn_encode
        rng = np.random.default_rng(seed)
        d = llm.word_embedding_dim
        self.proj = (rng.standard_normal(
            (gnn_out_dim, num_prompt_tokens * d)) /
            np.sqrt(gnn_out_dim)).astype(np.float32)
        self.num_prompt_tokens = num_prompt_tokens
        self.d = d

    def soft_prompt(self, x, edge_index) -> np.ndarray:
        z = np.asarray(self.gnn_encode(x, edge_index))
        g = z.mean(0)                                   # graph pooling
        return (g @ self.proj).reshape(self.num_prompt_tokens, self.d)

    def inference(self, question: List[str], graphs) -> List[str]:
        prompts = np.stack([self.soft_prompt(g[0], g[1])
                            for g in graphs])
        return self.llm.inference(question, soft_prompt=prompts)


class VisionTransformer:
    """HuggingFace Swin/ViT wrapper for image encoding (reference
    ``llm/models/vision_transformer.py``): ``forward(images)`` returns
    the backbone's last hidden state, used by GIT-Mol as the image
    modality encoder."""

    def __init__(self, model_name: str):
        self.model_name = model_name
        from transformers import SwinConfig, SwinModel
        self.config = SwinConfig.from_pretrained(model_name)
        self.model = SwinModel(self.config)

    def __call__(self, images, output_device=None):
        import torch
        with torch.no_grad():
            out = self.model(images).last_hidden_state
        return out.to(output_device) if output_device else out

    forward = __call__

    def __repr__(self) -> str:
        return f'{self.__class__.__name__}(model_name={self.model_name})'


# Reference path parity: ``torch_geometric.llm.models`` is the package
# holding every model class (reference ``llm/models/__init__.py``); here
# the classes live in sibling modules, re-exported under this name.
def __getattr__(name):  # lazy to avoid import cycles at package init
    _homes = {
        'GLEM': '.glem', 'glem_loss': '.glem',
        'TXT2KG': '.kg', 'LLMJudge': '.kg',
        'MoleculeGPT': '.multimodal', 'GITMol': '.multimodal',
        'GitMolGraphEncoder': '.multimodal',
        'ProteinMPNN': '.protein_mpnn',
        
    }
    if name in _homes:
        import importlib
        mod = importlib.import_module(_homes[name], __package__)
        return getattr(mod, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
