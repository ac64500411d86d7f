"""Graph attention encoder over the gene-pathway graph.

Inventory parity with the reference's `PathwayGraphEncoder`
(reference models/diffusion.py:14-88): a multi-head GAT stack with ELU,
dropout, global mean pooling, and a latent projection. In the reference
this component is dead code — defined, never instantiated (SURVEY §2).
Here it is a functional, tested Flax module so downstream users can wire
it into either model family (e.g. to encode the binary gene-pathway
matrix from data/pathways.create_gene_pathway_matrix into the condition
stream); it remains optional and is not part of the default graphs,
matching the reference's effective behavior.

TPU-first: edges are static index arrays; attention softmax per
destination node uses `jax.ops.segment_max/segment_sum` (no sparse
gather/scatter kernels, no dynamic shapes), so the whole encoder jits
cleanly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def gene_pathway_edges(gene_pathway_matrix: np.ndarray) -> np.ndarray:
    """Build a bidirectional gene<->gene edge list: two genes are
    connected when they share a pathway (via the bipartite membership
    matrix). Returns (2, E) int32, self-loops included."""
    gp = np.asarray(gene_pathway_matrix) > 0
    adj = (gp @ gp.T) > 0
    np.fill_diagonal(adj, True)
    src, dst = np.nonzero(adj)
    return np.stack([src, dst]).astype(np.int32)


class GATLayer(nn.Module):
    """One multi-head graph attention layer (Velickovic et al. 2018)."""

    features: int
    heads: int = 4
    concat: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,  # (N, F_in)
        edge_index: jnp.ndarray,  # (2, E) src -> dst
        deterministic: bool = True,
        dropout: float = 0.0,
    ) -> jnp.ndarray:
        n_nodes = h.shape[0]
        src, dst = edge_index[0], edge_index[1]

        wh = nn.Dense(self.features * self.heads, use_bias=False,
                      dtype=self.dtype, name="lin")(h)
        wh = wh.reshape(n_nodes, self.heads, self.features)

        attn_src = self.param(
            "attn_src", nn.initializers.glorot_uniform(),
            (self.heads, self.features), jnp.float32,
        )
        attn_dst = self.param(
            "attn_dst", nn.initializers.glorot_uniform(),
            (self.heads, self.features), jnp.float32,
        )
        # Per-node attention logits, gathered per edge.
        alpha_src = jnp.einsum("nhf,hf->nh", wh.astype(jnp.float32), attn_src)
        alpha_dst = jnp.einsum("nhf,hf->nh", wh.astype(jnp.float32), attn_dst)
        logits = jax.nn.leaky_relu(
            alpha_src[src] + alpha_dst[dst], negative_slope=0.2
        )  # (E, H)

        # Softmax over incoming edges of each destination node.
        logits_max = jax.ops.segment_max(
            logits, dst, num_segments=n_nodes
        )[dst]
        unnorm = jnp.exp(logits - logits_max)
        denom = jax.ops.segment_sum(unnorm, dst, num_segments=n_nodes)[dst]
        alpha = unnorm / jnp.maximum(denom, 1e-16)  # (E, H)

        if dropout > 0 and not deterministic:
            alpha = nn.Dropout(dropout, deterministic=False)(alpha)

        messages = wh[src].astype(jnp.float32) * alpha[..., None]  # (E, H, F)
        out = jax.ops.segment_sum(messages, dst, num_segments=n_nodes)

        if self.concat:
            return out.reshape(n_nodes, self.heads * self.features)
        return out.mean(axis=1)


class PathwayGraphEncoder(nn.Module):
    """GAT stack -> global mean pool -> latent projection."""

    input_dim: int
    hidden_dim: int
    latent_dim: int
    num_layers: int = 3
    heads: int = 4
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (N_nodes, input_dim)
        edge_index: jnp.ndarray,  # (2, E)
        batch: Optional[jnp.ndarray] = None,  # (N_nodes,) graph ids
        num_graphs: int = 1,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(x)
        h = jax.nn.elu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            h = GATLayer(
                features=self.hidden_dim,
                heads=1 if last else self.heads,
                concat=not last,
                dtype=self.dtype,
                name=f"gat_{i}",
            )(h, edge_index, deterministic, self.dropout)
            h = jax.nn.elu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        if batch is not None:
            pooled = jax.ops.segment_sum(h, batch, num_segments=num_graphs)
            counts = jax.ops.segment_sum(
                jnp.ones((h.shape[0], 1)), batch, num_segments=num_graphs
            )
            pooled = pooled / jnp.maximum(counts, 1.0)
        else:
            pooled = h.mean(axis=0, keepdims=True)

        return nn.Dense(self.latent_dim, dtype=self.dtype,
                        name="output_proj")(pooled).astype(jnp.float32)
