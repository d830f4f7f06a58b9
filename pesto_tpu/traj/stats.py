"""Statistical contacts model: inter-subunit distance histograms over an
ensemble + KL-divergence comparison against a bound reference
(reference md_analysis/mdtraj_utils/statistical_contacts_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np


def contacts_distribution(frames0, frames1, bins):
    """Histogram of inter-subunit pairwise distances per bin, accumulated
    over frames (reference contacts_distribution,
    statistical_contacts_model.py:7-30). Returns [num_bins] counts."""
    frames0 = jnp.asarray(frames0, jnp.float32)
    frames1 = jnp.asarray(frames1, jnp.float32)
    bins = jnp.asarray(bins, jnp.float32)

    @jax.jit
    def per_frame(x0, x1):
        d = jnp.sqrt(jnp.sum((x0[:, None, :] - x1[None, :, :]) ** 2, axis=-1))
        d = d.reshape(-1)
        # bin index per distance (outside range -> dropped)
        idx = jnp.searchsorted(bins, d) - 1
        ok = (idx >= 0) & (idx < bins.shape[0] - 1)
        contrib = jax.nn.one_hot(jnp.where(ok, idx, 0), bins.shape[0] - 1) * ok[:, None]
        return jnp.sum(contrib, axis=0)

    hists = jax.lax.map(lambda ab: per_frame(*ab), (frames0, frames1))
    return np.asarray(jnp.sum(hists, axis=0))


def div_KL(P, Q, eps=1e-12):
    """KL(P||Q) with normalization (reference :78-81)."""
    P = np.asarray(P, dtype=np.float64) + eps
    Q = np.asarray(Q, dtype=np.float64) + eps
    P = P / P.sum()
    Q = Q / Q.sum()
    return float(np.sum(P * np.log(P / Q)))


class StatisticalContactsModel:
    """Distance-histogram model of an interface ensemble
    (reference StatisticalContactsModel, statistical_contacts_model.py:33-75)."""

    def __init__(self, xmin=0.0, xmax=10.0, num_bins=21):
        self.bins = np.linspace(xmin, xmax, num_bins)
        self.hist = np.zeros(num_bins - 1)

    def update(self, frames0, frames1):
        self.hist = self.hist + contacts_distribution(frames0, frames1, self.bins)
        return self

    @property
    def distribution(self):
        h = self.hist + 1e-12
        return h / h.sum()

    def compare(self, other) -> float:
        return div_KL(self.distribution, other.distribution)


def interface_ensemble_comparison(
    ref_frames0, ref_frames1, frames0, frames1, xmin=0.0, xmax=10.0, num_bins=21
):
    """KL divergence between the bound-reference interface distance
    distribution and the sampled ensemble (reference :84-106)."""
    m_ref = StatisticalContactsModel(xmin, xmax, num_bins).update(ref_frames0, ref_frames1)
    m_ens = StatisticalContactsModel(xmin, xmax, num_bins).update(frames0, frames1)
    return m_ens.compare(m_ref)
