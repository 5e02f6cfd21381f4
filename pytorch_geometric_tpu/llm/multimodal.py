"""Multimodal molecule-language models: MoleculeGPT and GIT-Mol.

Reference: ``torch_geometric/llm/models/molecule_gpt.py:26`` and
``git_mol.py:107``. The graph towers (GINE stacks) and Q-Former
projectors are native flax/JAX and fully testable offline; the
language / vision towers load through ``transformers`` at call time
(same optional-dependency gating as the reference, whose towers also
download HF checkpoints).
"""

from typing import Callable, List, Optional

import flax.linen as fnn
import jax.numpy as jnp
import numpy as np

from ..nn.attention import QFormer


def pad_or_truncate(emb: jnp.ndarray, max_seq_len: int,
                    padding_value: float = 0.0) -> jnp.ndarray:
    """[B, L, D] -> [B, max_seq_len, D] (reference
    ``molecule_gpt.py:11``)."""
    b, l, d = emb.shape
    if l >= max_seq_len:
        return emb[:, :max_seq_len]
    pad = jnp.full((b, max_seq_len - l, d), padding_value, emb.dtype)
    return jnp.concatenate([emb, pad], axis=1)


class GitMolGraphEncoder(fnn.Module):
    """GINE tower over categorical atom/bond features (reference
    ``git_mol.py:13`` GraphEncoder). Returns dense-batched node
    states + mask."""
    num_layers: int = 2
    in_channels: int = 16
    dropout: float = 0.0
    num_atom_type: int = 120
    num_chirality_tag: int = 3
    num_bond_type: int = 6
    num_bond_direction: int = 3

    @fnn.compact
    def __call__(self, x, edge_index, batch, edge_attr,
                 batch_size: int = 1, max_nodes: Optional[int] = None,
                 train: bool = False):
        from ..nn.conv import GINEConv
        from ..nn.models.mlp import MLP
        from ..utils import to_dense_batch
        n = x.shape[0]
        h = (fnn.Embed(self.num_atom_type, self.in_channels,
                       name='x_embed1')(x[:, 0].astype(jnp.int32))
             + fnn.Embed(self.num_chirality_tag, self.in_channels,
                         name='x_embed2')(x[:, 1].astype(jnp.int32)))
        coo = (edge_index.coo if hasattr(edge_index, 'coo')
               else jnp.asarray(edge_index))
        loops = jnp.arange(n, dtype=coo.dtype)
        coo = jnp.concatenate([coo, jnp.stack([loops, loops])], axis=1)
        ea = jnp.concatenate(
            [edge_attr, jnp.zeros((n, edge_attr.shape[1]),
                                  edge_attr.dtype)], axis=0)
        e = (fnn.Embed(self.num_bond_type, self.in_channels,
                       name='edge_embed1')(ea[:, 0].astype(jnp.int32))
             + fnn.Embed(self.num_bond_direction, self.in_channels,
                         name='edge_embed2')(ea[:, 1].astype(jnp.int32)))
        for i in range(self.num_layers):
            conv = GINEConv(mlp=MLP(channel_list=[2 * self.in_channels,
                                                  self.in_channels]),
                            train_eps=True, edge_dim=self.in_channels,
                            name=f'gnn_{i}')
            h = conv(h, coo, e)
            h = fnn.LayerNorm(name=f'norm_{i}')(h)
            if i < self.num_layers - 1:
                h = fnn.relu(h)
            h = fnn.Dropout(self.dropout,
                            deterministic=not train)(h)
        return to_dense_batch(h, batch, batch_size, max_nodes or n)


class MoleculeGPT(fnn.Module):
    """2D-graph + 1D-SMILES instruction model (reference
    ``molecule_gpt.py:26``).

    The flax side covers ``encode``: graph tower -> Q-Former, SMILES
    embeddings -> Q-Former, concat -> projector producing one soft
    prompt per molecule. Text generation feeds that soft prompt to a
    causal LM via :class:`pytorch_geometric_tpu.llm.LLM`
    (transformers-gated, like the reference's vicuna tower).
    """
    graph_channels: int = 16
    num_graph_layers: int = 2
    mlp_out_channels: int = 32
    max_tokens: int = 20
    llm_embed_dim: int = 64
    smiles_dim: int = 384

    @fnn.compact
    def __call__(self, x, edge_index, batch, edge_attr,
                 smiles_emb: jnp.ndarray, batch_size: int = 1
                 ) -> jnp.ndarray:
        """Returns the per-molecule soft-prompt embedding
        ``[batch_size, llm_embed_dim]`` (reference ``encode`` +
        projector, ``molecule_gpt.py:97-140``)."""
        hg, mask = GitMolGraphEncoder(
            self.num_graph_layers, self.graph_channels,
            name='graph_encoder')(x, edge_index, batch, edge_attr,
                                  batch_size=batch_size)
        out_g = QFormer(self.mlp_out_channels,
                        num_queries=self.max_tokens,
                        name='graph_qformer')(hg, mask=mask)
        out_g = pad_or_truncate(out_g, self.max_tokens)
        out_g = out_g.reshape(batch_size, -1)

        if smiles_emb.ndim == 2:
            smiles_emb = smiles_emb[:, None, :]
        out_s = QFormer(self.mlp_out_channels,
                        num_queries=self.max_tokens,
                        name='smiles_qformer')(smiles_emb)
        out_s = pad_or_truncate(out_s, self.max_tokens)
        out_s = out_s.reshape(batch_size, -1)

        h = jnp.concatenate([out_g, out_s], axis=1)
        h = fnn.sigmoid(fnn.Dense(h.shape[-1], name='projector_0')(h))
        return fnn.Dense(self.llm_embed_dim, name='projector_1')(h)

    @staticmethod
    def generate(llm, soft_prompt: np.ndarray,
                 instructions: List[str], max_tokens: int = 32
                 ) -> List[str]:
        """Decode with the soft prompt prepended (reference
        ``inference``, ``molecule_gpt.py:172``)."""
        return llm.inference(instructions, max_tokens=max_tokens,
                             soft_prompt=np.asarray(soft_prompt))


class GITMol(fnn.Module):
    """Graph-image-text pretraining model (reference ``git_mol.py:107``).

    The flax side covers the graph tower and the cross-modal
    projection heads used by the contrastive (XTC) and matching (XTM)
    losses; the SciBERT text tower and Swin vision tower are
    transformers-gated exactly like the reference. ``__call__`` takes
    precomputed text/image embeddings and returns the pooled per-modal
    embeddings; :meth:`xtc_loss` gives the symmetric InfoNCE loss
    (reference ``_calc_xtc_loss``)."""
    graph_channels: int = 16
    num_graph_layers: int = 2
    embed_dim: int = 32

    @fnn.compact
    def __call__(self, x, edge_index, batch, edge_attr,
                 text_emb: jnp.ndarray,
                 image_emb: Optional[jnp.ndarray] = None,
                 batch_size: int = 1):
        hg, mask = GitMolGraphEncoder(
            self.num_graph_layers, self.graph_channels,
            name='graph_encoder')(x, edge_index, batch, edge_attr,
                                  batch_size=batch_size)
        g = (hg * mask[..., None]).sum(1) \
            / jnp.maximum(mask.sum(1)[:, None], 1)
        zg = fnn.Dense(self.embed_dim, name='graph_proj')(g)
        zt = fnn.Dense(self.embed_dim, name='text_proj')(text_emb)
        zi = (fnn.Dense(self.embed_dim, name='image_proj')(image_emb)
              if image_emb is not None else None)
        norm = lambda z: z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-9)
        return norm(zg), norm(zt), (norm(zi) if zi is not None else None)

    @staticmethod
    def xtc_loss(za: jnp.ndarray, zb: jnp.ndarray,
                 temperature: float = 0.07) -> jnp.ndarray:
        """Symmetric cross-modal InfoNCE (reference
        ``git_mol.py:_calc_xtc_loss``)."""
        import jax
        logits = za @ zb.T / temperature
        labels = jnp.arange(za.shape[0])
        la = -jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                  labels[:, None], 1).mean()
        lb = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, -1),
                                  labels[:, None], 1).mean()
        return 0.5 * (la + lb)
