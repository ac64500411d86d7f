"""GAT pathway encoder: attention normalization, pooling, jit."""

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.models.gnn import (
    GATLayer,
    PathwayGraphEncoder,
    gene_pathway_edges,
)


def test_gene_pathway_edges():
    gp = np.array([
        [1, 0],
        [1, 0],
        [0, 1],
    ])
    edges = gene_pathway_edges(gp)
    pairs = set(map(tuple, edges.T.tolist()))
    # Genes 0,1 share pathway 0; gene 2 isolated (self-loop only).
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (0, 2) not in pairs
    assert (2, 2) in pairs  # self loop


def test_gat_layer_attention_is_weighted_mean(rng):
    # With identical incoming features, output equals the (single) W h.
    n, f = 4, 8
    x = jnp.asarray(np.tile(rng.normal(size=(1, f)), (n, 1)).astype(np.float32))
    edges = jnp.asarray(np.array([[0, 1, 2, 3], [0, 1, 2, 3]]))  # self loops
    layer = GATLayer(features=6, heads=2, concat=True)
    params = layer.init(jax.random.PRNGKey(0), x, edges)
    out = layer.apply(params, x, edges)
    assert out.shape == (n, 12)
    # All nodes identical input + self-loop only => identical outputs.
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               rtol=1e-5)


def test_gat_attention_normalizes(rng):
    # Attention weights over incoming edges sum to 1 per (node, head):
    # output magnitude must not blow up with edge count.
    n, f = 6, 4
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    # Dense graph.
    src, dst = np.meshgrid(np.arange(n), np.arange(n))
    edges = jnp.asarray(np.stack([src.ravel(), dst.ravel()]).astype(np.int32))
    layer = GATLayer(features=4, heads=1, concat=False)
    params = layer.init(jax.random.PRNGKey(0), x, edges)
    out = np.asarray(layer.apply(params, x, edges))
    wh = np.asarray(
        x @ np.asarray(params["params"]["lin"]["kernel"])
    )
    # Convex combination of W h rows => within their min/max bounds.
    assert out.max() <= wh.max() + 1e-4
    assert out.min() >= wh.min() - 1e-4


def test_pathway_graph_encoder_shapes(rng):
    n_nodes, input_dim = 10, 5
    x = jnp.asarray(rng.normal(size=(n_nodes, input_dim)).astype(np.float32))
    gp = rng.integers(0, 2, size=(n_nodes, 3))
    edges = jnp.asarray(gene_pathway_edges(gp))
    enc = PathwayGraphEncoder(input_dim=input_dim, hidden_dim=16,
                              latent_dim=8, num_layers=2, heads=2)
    params = enc.init(jax.random.PRNGKey(0), x, edges)
    out = enc.apply(params, x, edges)
    assert out.shape == (1, 8)

    # Batched pooling over two graphs.
    batch = jnp.asarray([0] * 5 + [1] * 5)
    out2 = enc.apply(params, x, edges, batch=batch, num_graphs=2)
    assert out2.shape == (2, 8)

    # Jit-compatible.
    jitted = jax.jit(lambda p, x, e: enc.apply(p, x, e))
    out3 = jitted(params, x, edges)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3), rtol=1e-5)
