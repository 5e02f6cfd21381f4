"""Feature encoders (reference ``graphgym/models/encoder.py``):
Integer / OGB-Atom / OGB-Bond embedding encoders, registered in the
GraphGym registry. The OGB feature cardinalities are inlined (the
``ogb`` package's ``get_atom/bond_feature_dims``, frozen upstream) —
zero-egress environment."""

import flax.linen as fnn
import jax.numpy as jnp

from .register import register_edge_encoder, register_node_encoder

# ogb.utils.features.get_atom_feature_dims() / get_bond_feature_dims()
OGB_ATOM_FEATURE_DIMS = [119, 4, 12, 12, 10, 6, 6, 2, 2]
OGB_BOND_FEATURE_DIMS = [5, 6, 2]


class IntegerFeatureEncoder(fnn.Module):
    """Embeds the first integer feature column
    (reference ``encoder.py:IntegerFeatureEncoder``)."""
    emb_dim: int
    num_classes: int

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        emb = fnn.Embed(self.num_classes, self.emb_dim,
                        embedding_init=fnn.initializers.xavier_uniform())
        ids = x[:, 0] if x.ndim > 1 else x
        return emb(ids.astype(jnp.int32))


class _SummedEmbeds(fnn.Module):
    """Sum of per-column embeddings over categorical feature columns."""
    emb_dim: int
    dims: tuple

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[1] > len(self.dims):
            # reference surfaces this as an IndexError into the
            # embedding list; silent truncation would hide a
            # data-pipeline mismatch
            raise ValueError(
                f'{type(self).__name__} expected <= {len(self.dims)} '
                f'feature columns, got {x.shape[1]}')
        out = 0
        n_cols = x.shape[1]
        for i in range(n_cols):
            emb = fnn.Embed(
                self.dims[i], self.emb_dim, name=f'emb_{i}',
                embedding_init=fnn.initializers.xavier_uniform())
            out = out + emb(x[:, i].astype(jnp.int32))
        return out


class AtomEncoder(_SummedEmbeds):
    """OGB molecule atom encoder (reference ``encoder.py:AtomEncoder``)."""
    dims: tuple = tuple(OGB_ATOM_FEATURE_DIMS)


class BondEncoder(_SummedEmbeds):
    """OGB molecule bond encoder (reference ``encoder.py:BondEncoder``);
    apply to ``edge_attr``."""
    dims: tuple = tuple(OGB_BOND_FEATURE_DIMS)


register_node_encoder('Integer', IntegerFeatureEncoder)
register_node_encoder('Atom', AtomEncoder)
register_edge_encoder('Bond', BondEncoder)
