"""Margin-based projection heads (classification losses).

Behavioral spec: wespeaker/models/projections.py (get_projection:25,
SphereFace2:72, ArcMarginProduct:175, ArcMarginProduct_intertopk_subcenter:249,
AddMarginProduct:375, SphereProduct:417, HyperbolicAMSoftmax:477, Linear:559).

JAX design difference: the reference mutates the module via
``projection.update(margin)`` from a host-side scheduler. Here margin is a
*traced argument* of ``__call__`` so the whole train step stays jit-compiled
with the margin schedule evaluated on device — no recompilation as margin
ramps.

Contract (wespeaker/utils/executor.py:60-66): call as
``projection(embed, label, margin)`` -> logits, or (logits, loss) for heads
that compute their own loss (SphereFace2).
"""

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _xavier_uniform_out_in():
    """torch nn.init.xavier_uniform_; weights stored (out, in) like torch."""
    base = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    return base


class ArcMarginProduct(nn.Module):
    """Additive angular margin: cos(theta + m), with the 'mmm' continuity fix
    (projections.py:205-231)."""
    in_features: int
    out_features: int
    scale: float = 32.0
    easy_margin: bool = False

    @nn.compact
    def __call__(self, embed, label, margin=0.0):
        weight = self.param("weight", _xavier_uniform_out_in(),
                            (self.out_features, self.in_features))
        cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
        th = jnp.cos(math.pi - margin)
        mmm = 1.0 + jnp.cos(math.pi - margin)

        cosine = _l2norm(embed) @ _l2norm(weight, axis=1).T
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > th, phi, cosine - mmm)
        one_hot = jax.nn.one_hot(label, self.out_features, dtype=cosine.dtype)
        return self.scale * (one_hot * phi + (1.0 - one_hot) * cosine)


class AddMarginProduct(nn.Module):
    """Additive cosine margin: cos(theta) - m (CosFace)."""
    in_features: int
    out_features: int
    scale: float = 32.0

    @nn.compact
    def __call__(self, embed, label, margin=0.0):
        weight = self.param("weight", _xavier_uniform_out_in(),
                            (self.out_features, self.in_features))
        cosine = _l2norm(embed) @ _l2norm(weight, axis=1).T
        one_hot = jax.nn.one_hot(label, self.out_features, dtype=cosine.dtype)
        return self.scale * (cosine - one_hot * margin)


class ArcMarginIntertopkSubcenter(nn.Module):
    """Sub-center ArcFace with inter-top-k penalty (arXiv:2110.05042,
    projections.py:249-372)."""
    in_features: int
    out_features: int
    scale: float = 32.0
    easy_margin: bool = False
    K: int = 3
    mp: float = 0.06
    k_top: int = 5
    do_lm: bool = False

    @nn.compact
    def __call__(self, embed, label, margin=0.0):
        mp = 0.0 if self.do_lm else self.mp
        k_top = 0 if self.do_lm else self.k_top
        weight = self.param("weight", _xavier_uniform_out_in(),
                            (self.K * self.out_features, self.in_features))
        cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
        th = jnp.cos(math.pi - margin)
        mmm = 1.0 + jnp.cos(math.pi - margin)
        # hard-sample margin ramps with the main margin (projections.py:323-329)
        mp_eff = jnp.where(margin > 0.001, mp * (margin / 0.2), 0.0)
        cos_mp, sin_mp = jnp.cos(mp_eff), jnp.sin(mp_eff)

        cosine = _l2norm(embed) @ _l2norm(weight, axis=1).T
        cosine = jnp.max(
            cosine.reshape(-1, self.out_features, self.K), axis=2)
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        phi_mp = cosine * cos_mp + sine * sin_mp
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > th, phi, cosine - mmm)
        one_hot = jax.nn.one_hot(label, self.out_features, dtype=cosine.dtype)
        if k_top > 0:
            _, idx = jax.lax.top_k(cosine - 2 * one_hot, k_top)
            top_k_one_hot = jnp.sum(
                jax.nn.one_hot(idx, self.out_features, dtype=cosine.dtype),
                axis=1)
            out = (one_hot * phi + top_k_one_hot * phi_mp
                   + (1.0 - one_hot - top_k_one_hot) * cosine)
        else:
            out = one_hot * phi + (1.0 - one_hot) * cosine
        return self.scale * out


class SphereFace2(nn.Module):
    """Binary-classification margin loss; returns (logits, loss)
    (projections.py:72-172)."""
    in_features: int
    out_features: int
    scale: float = 32.0
    lanbuda: float = 0.7
    t: int = 3
    margin_type: str = "C"

    @nn.compact
    def __call__(self, embed, label, margin=0.0):
        weight = self.param("weight", _xavier_uniform_out_in(),
                            (self.out_features, self.in_features))
        bias = self.param("bias", nn.initializers.zeros, (1, 1))
        cos = _l2norm(embed) @ _l2norm(weight, axis=1).T

        def fun_g(z, t):
            return 2.0 * ((z + 1.0) / 2.0) ** t - 1.0

        b = bias[0, 0]
        if self.margin_type == "A":
            cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
            th = jnp.cos(math.pi - margin)
            mmm = 1.0 + jnp.cos(math.pi - margin)
            sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 0.0, 1.0))
            cos_m_theta_p = self.scale * fun_g(
                jnp.where(cos > th, cos * cos_m - sin * sin_m, cos - mmm),
                self.t) + b
            cos_m_theta_n = self.scale * fun_g(
                cos * cos_m + sin * sin_m, self.t) + b
        else:
            cos_m_theta_p = self.scale * (fun_g(cos, self.t) - margin) + b
            cos_m_theta_n = self.scale * (fun_g(cos, self.t) + margin) + b
        cos_p_theta = self.lanbuda * jnp.log1p(jnp.exp(-cos_m_theta_p))
        cos_n_theta = (1 - self.lanbuda) * jnp.log1p(jnp.exp(cos_m_theta_n))

        target = jax.nn.one_hot(label, self.out_features, dtype=cos.dtype)
        logits = self.scale * ((cos - margin) * target + cos * (1 - target))
        loss = jnp.mean(
            jnp.sum(target * cos_p_theta + (1 - target) * cos_n_theta,
                    axis=1))
        return logits, loss


class SphereProduct(nn.Module):
    """A-Softmax cos(m*theta) (projections.py:417-474). The reference's
    iteration-dependent lambda annealing is passed in as `margin` misuse-free
    via the `it` argument."""
    in_features: int
    out_features: int
    margin: int = 4
    base: float = 1000.0
    gamma: float = 0.12
    power: float = 1.0
    lambda_min: float = 5.0

    @nn.compact
    def __call__(self, embed, label, it=0):
        weight = self.param("weight", _xavier_uniform_out_in(),
                            (self.out_features, self.in_features))
        lamb = jnp.maximum(self.lambda_min,
                           self.base * (1 + self.gamma * it) ** (-self.power))
        cos_theta = jnp.clip(_l2norm(embed) @ _l2norm(weight, axis=1).T, -1, 1)
        mlambda = [
            lambda x: x * 0 + 1, lambda x: x, lambda x: 2 * x**2 - 1,
            lambda x: 4 * x**3 - 3 * x, lambda x: 8 * x**4 - 8 * x**2 + 1,
            lambda x: 16 * x**5 - 20 * x**3 + 5 * x,
        ]
        cos_m_theta = mlambda[self.margin](cos_theta)
        theta = jnp.arccos(cos_theta)
        k = jnp.floor(self.margin * theta / math.pi)
        phi_theta = ((-1.0) ** k) * cos_m_theta - 2 * k
        feat_norm = jnp.linalg.norm(embed, axis=1, keepdims=True)
        one_hot = jax.nn.one_hot(label, self.out_features,
                                 dtype=cos_theta.dtype)
        out = one_hot * (phi_theta - cos_theta) / (1 + lamb) + cos_theta
        return out * feat_norm


class HyperbolicAMSoftmax(nn.Module):
    """Poincare-ball additive-margin softmax (projections.py:477-556)."""
    in_features: int
    out_features: int
    scale: float = 30.0
    curvature: float = 1.0

    def proj_to_ball(self, x, eps=1e-5):
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
        max_norm = (1.0 - eps) / (self.curvature ** 0.5)
        return x * jnp.minimum(max_norm / norm, 1.0)

    @nn.compact
    def __call__(self, embed, label, margin=0.0):
        weight = self.param(
            "weight",
            lambda key, shape: 1e-3 * jax.random.normal(key, shape),
            (self.out_features, self.in_features))
        x = self.proj_to_ball(embed)  # (B, D)
        w = self.proj_to_ball(weight)  # (C, D)
        eps = 1e-5
        xn = jnp.clip(jnp.linalg.norm(x, axis=-1), 0.0, 1 - eps)  # (B,)
        wn = jnp.clip(jnp.linalg.norm(w, axis=-1), 0.0, 1 - eps)  # (C,)
        diff2 = jnp.sum((x[:, None, :] - w[None, :, :]) ** 2, axis=-1)
        denom = jnp.maximum((1 - xn[:, None] ** 2) * (1 - wn[None, :] ** 2),
                            eps)
        dist = jnp.arccosh(jnp.maximum(1 + 2 * diff2 / denom, 1.0 + eps))
        one_hot = jax.nn.one_hot(label, self.out_features, dtype=dist.dtype)
        return -self.scale * (dist + one_hot * margin)


class LinearProjection(nn.Module):
    """Plain softmax head: BN -> ReLU -> Linear (projections.py:559-573)."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, embed, label=None, margin=0.0, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="trans_bn")(embed)
        h = nn.relu(h)
        return nn.Dense(self.out_features, name="trans_linear")(h)


def get_projection(conf: Dict[str, Any]) -> nn.Module:
    """Factory mirroring wespeaker/models/projections.py:25-69."""
    ptype = conf.get("project_type", "linear")
    embed_dim, num_class = conf["embed_dim"], conf["num_class"]
    if ptype == "add_margin":
        return AddMarginProduct(embed_dim, num_class, scale=conf["scale"])
    if ptype == "arc_margin":
        return ArcMarginProduct(embed_dim, num_class, scale=conf["scale"],
                                easy_margin=conf.get("easy_margin", False))
    if ptype == "arc_margin_intertopk_subcenter":
        return ArcMarginIntertopkSubcenter(
            embed_dim, num_class, scale=conf["scale"],
            easy_margin=conf.get("easy_margin", False),
            K=conf.get("K", 3), mp=conf.get("mp", 0.06),
            k_top=conf.get("k_top", 5), do_lm=conf.get("do_lm", False))
    if ptype == "sphere":
        return SphereProduct(embed_dim, num_class, margin=4)
    if ptype == "sphereface2":
        return SphereFace2(embed_dim, num_class, scale=conf["scale"],
                           t=conf.get("t", 3),
                           lanbuda=conf.get("lanbuda", 0.7),
                           margin_type=conf.get("margin_type", "C"))
    if ptype == "ham_margin":
        return HyperbolicAMSoftmax(embed_dim, num_class, scale=conf["scale"],
                                   curvature=conf.get("curvature", 1.0))
    return LinearProjection(embed_dim, num_class)
