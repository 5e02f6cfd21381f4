"""GraphRAG / LLM stack.

Reference: ``torch_geometric/llm/models/llm.py:51`` (LLM wrapper),
``g_retriever.py:10`` (GNN soft-prompt -> LLM, trainable: label-token
LM loss + projector + optional LoRA), ``sentence_transformer.py``. The
HF models load through ``transformers`` (baked into this image); the
GNN encoder is ours (JAX); the projector maps pooled graph embeddings
into the LLM's input embedding space as soft prompt tokens and trains
against the HF loss — same architecture, torch only on the LM side.
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

    @classmethod
    def from_model(cls, model, tokenizer) -> 'LLM':
        """Wrap an in-memory HF model + tokenizer (config-constructed
        tiny models in the zero-egress test environment; any
        ``__call__``-to-ids / ``decode`` duck-typed tokenizer works)."""
        obj = cls.__new__(cls)
        obj.model = model
        obj.tokenizer = tokenizer
        return obj

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


class LoraLinear:
    """Minimal LoRA adapter around a frozen linear map (the reference
    delegates to peft, ``g_retriever.py:56-76``; peft is absent here
    and the math is 10 lines): ``y = base(x) + (x @ A @ B) * alpha/r``
    with A ~ N(0, 0.02), B = 0 (identity at init). Handles both
    ``torch.nn.Linear`` and HF's transposed ``Conv1D``."""

    def __new__(cls, base, r: int = 8, alpha: int = 16):
        import torch

        class _Lora(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.base = base
                for p in self.base.parameters():
                    p.requires_grad_(False)
                w = base.weight
                # nn.Linear stores [out, in]; HF Conv1D stores [in, out]
                self._conv1d = type(base).__name__ == 'Conv1D'
                fan_in = w.shape[0] if self._conv1d else w.shape[1]
                fan_out = w.shape[1] if self._conv1d else w.shape[0]
                self.A = torch.nn.Parameter(
                    0.02 * torch.randn(fan_in, r))
                self.B = torch.nn.Parameter(torch.zeros(r, fan_out))
                self.scale = alpha / r

            def forward(self, x):
                return self.base(x) + (x @ self.A @ self.B) * self.scale

        return _Lora()


def apply_lora(model, r: int = 8, alpha: int = 16,
               target_suffixes=('q_proj', 'v_proj', 'c_attn')):
    """Swap every targeted projection for a :class:`LoraLinear`;
    returns the list of trainable LoRA parameters (reference:
    peft ``LoraConfig(target_modules=['q_proj','v_proj'])``,
    ``g_retriever.py:62-75``)."""
    import torch
    params = []
    for name, mod in list(model.named_modules()):
        for child_name, child in list(mod.named_children()):
            full = f'{name}.{child_name}' if name else child_name
            if full.rsplit('.', 1)[-1] in target_suffixes and \
                    hasattr(child, 'weight') and child.weight.ndim == 2:
                lora = LoraLinear(child, r, alpha)
                setattr(mod, child_name, lora)
                params += [lora.A, lora.B]
    return params


class GRetriever:
    """GNN soft-prompt + LLM, TRAINABLE END-TO-END (reference
    ``llm/models/g_retriever.py:46-170``).

    Two GNN modes:

    * ``gnn_encode(x, edge_index) -> [N, D]``: a plain callable,
      FROZEN w.r.t. the LM loss (a deliberate deviation available for
      cheap fine-tuning; the reference's GNN is a torch submodule that
      trains through the LM loss by default, ``g_retriever.py:52,113``).
    * ``gnn_apply(params, x, edge_index) -> [N, D]`` + ``gnn_params``:
      a functional JAX model that TRAINS jointly — the LM-loss
      cotangent crosses the torch->JAX boundary at the pooled
      projector input: forward records a ``jax.vjp`` per sample and
      hands the pooled embedding to torch as a grad-requiring leaf;
      after ``loss.backward()``, :meth:`gnn_grads` pulls each leaf's
      ``.grad`` back through the saved VJPs and sums them into one
      params-pytree gradient (one more optax update for the caller,
      or use :meth:`train_step`). This matches the reference default.

    The projector is the reference's
    Linear->Sigmoid->Linear->Unflatten MLP (``g_retriever.py:79-87``)
    in torch, so its gradients flow from the HF loss directly;
    :meth:`forward` computes the autoregressive LM loss over the label
    tokens with the soft prompt prepended (``llm.py::_get_embeds``
    layout: [bos | graph tokens | question | label], labels masked to
    -100 everywhere except the label positions)."""

    def __init__(self, llm: LLM, gnn_encode: Optional[Callable] = None,
                 gnn_out_dim: int = 0, num_prompt_tokens: int = 1,
                 use_lora: bool = False, seed: int = 0,
                 gnn_apply: Optional[Callable] = None,
                 gnn_params: Any = None):
        import torch
        torch.manual_seed(seed)
        assert (gnn_encode is None) != (gnn_apply is None), \
            'pass exactly one of gnn_encode (frozen) or ' \
            'gnn_apply+gnn_params (jointly trained)'
        self.llm = llm
        self.gnn_encode = gnn_encode
        self.gnn_apply = gnn_apply
        self.gnn_params = gnn_params
        self._pending = []    # (torch leaf, jax vjp) per fwd sample
        self.num_prompt_tokens = num_prompt_tokens
        self.d = llm.word_embedding_dim
        self.projector = torch.nn.Sequential(
            torch.nn.Linear(gnn_out_dim, gnn_out_dim),
            torch.nn.Sigmoid(),
            torch.nn.Linear(gnn_out_dim, self.d * num_prompt_tokens),
        )
        for p in self.llm.model.parameters():
            p.requires_grad_(False)
        self.lora_params = (apply_lora(self.llm.model)
                            if use_lora else [])

    def parameters(self):
        """Trainable TORCH parameters: projector (+ LoRA adapters).
        The JAX GNN side trains via :meth:`gnn_grads` / optax."""
        return list(self.projector.parameters()) + self.lora_params

    def soft_prompt(self, x, edge_index):
        """[num_prompt_tokens, d] torch tensor with grad through the
        projector; in ``gnn_apply`` mode also through the GNN (the
        pooled embedding is a grad-requiring torch leaf whose ``.grad``
        :meth:`gnn_grads` routes back through ``jax.vjp``)."""
        import torch
        if self.gnn_apply is not None:
            import jax
            import jax.numpy as jnp

            def pooled(params):
                return self.gnn_apply(params, x, edge_index).mean(0)

            g_jax, vjp = jax.vjp(pooled, self.gnn_params)
            g = torch.tensor(np.asarray(g_jax), dtype=torch.float32,
                             requires_grad=True)
            if torch.is_grad_enabled():
                self._pending.append((g, vjp, jnp))
        else:
            z = np.asarray(self.gnn_encode(x, edge_index))
            g = torch.as_tensor(z.mean(0), dtype=torch.float32)
        return self.projector(g).reshape(self.num_prompt_tokens, self.d)

    def gnn_grads(self):
        """Pull the LM-loss cotangents recorded since the last call
        back through the saved VJPs; returns the summed gradient
        pytree for ``gnn_params`` (None when the GNN is frozen or no
        backward has run)."""
        import jax
        grads = None
        for g, vjp, jnp_mod in self._pending:
            if g.grad is None:
                continue
            (dp,) = vjp(jnp_mod.asarray(
                np.asarray(g.grad.detach(), np.float32)))
            grads = dp if grads is None else jax.tree_util.tree_map(
                lambda a, b: a + b, grads, dp)
        self._pending.clear()
        return grads

    def train_step(self, question, graphs, label, torch_opt,
                   gnn_opt=None, gnn_opt_state=None):
        """One joint update: torch loss/backward/step plus, in
        ``gnn_apply`` mode, an optax update on ``gnn_params``.
        Returns ``(loss, gnn_opt_state)``."""
        import optax
        torch_opt.zero_grad()
        loss = self.forward(question, graphs, label)
        loss.backward()
        torch_opt.step()
        if self.gnn_apply is not None:
            grads = self.gnn_grads()       # always drain the records
            if gnn_opt is not None and grads is not None:
                updates, gnn_opt_state = gnn_opt.update(
                    grads, gnn_opt_state, self.gnn_params)
                self.gnn_params = optax.apply_updates(
                    self.gnn_params, updates)
        return float(loss.detach()), gnn_opt_state

    def _ids(self, text):
        import torch
        out = self.llm.tokenizer(text)
        ids = out['input_ids'] if isinstance(out, dict) else \
            out.input_ids
        t = torch.as_tensor(ids).reshape(-1)
        return t.long()

    def forward(self, question: List[str], graphs, label: List[str]):
        """Mean LM loss over the batch (reference forward
        ``g_retriever.py:117-170``)."""
        import torch
        # drop any cotangent records a previous forward left undrained
        # (backward never ran, or the caller skipped gnn_grads) — they
        # pin VJP residuals and would mix stale gradients in
        self._pending.clear()
        emb = self.llm.model.get_input_embeddings()
        losses = []
        for q, g, lab in zip(question, graphs, label):
            sp = self.soft_prompt(g[0], g[1])
            q_ids = self._ids(q)
            l_ids = self._ids(lab)
            eos = getattr(self.llm.tokenizer, 'eos_token_id', None)
            if eos is not None:
                l_ids = torch.cat(
                    [l_ids, torch.tensor([eos], dtype=torch.long)])
            seq = torch.cat([sp.to(emb.weight.dtype),
                             emb(q_ids), emb(l_ids)], dim=0)
            labels = torch.cat([
                torch.full((sp.shape[0] + len(q_ids),), -100,
                           dtype=torch.long), l_ids])
            out = self.llm.model(inputs_embeds=seq[None],
                                 labels=labels[None])
            losses.append(out.loss)
        return torch.stack(losses).mean()

    def inference(self, question: List[str], graphs,
                  max_tokens: int = 8) -> List[str]:
        """Greedy decode with the soft prompt prepended (reference
        ``g_retriever.py::inference``)."""
        import torch
        emb = self.llm.model.get_input_embeddings()
        outs = []
        eos = getattr(self.llm.tokenizer, 'eos_token_id', None)
        with torch.no_grad():
            for q, g in zip(question, graphs):
                sp = self.soft_prompt(g[0], g[1])
                seq = torch.cat([sp.to(emb.weight.dtype),
                                 emb(self._ids(q))], dim=0)[None]
                toks = []
                for _ in range(max_tokens):
                    logits = self.llm.model(
                        inputs_embeds=seq).logits[0, -1]
                    nxt = int(logits.argmax())
                    if eos is not None and nxt == eos:
                        break
                    toks.append(nxt)
                    seq = torch.cat(
                        [seq, emb(torch.tensor([[nxt]]))], dim=1)
                outs.append(self.llm.tokenizer.decode(
                    toks, skip_special_tokens=True))
        return outs


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
