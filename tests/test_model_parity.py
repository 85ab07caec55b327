"""Numerical parity of wespeaker_tpu flax models vs the reference torch
implementations: random-init reference model -> state_dict conversion ->
same input -> embeddings must agree to fp32 tolerance."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.conftest import reference_available
from tests.torch_ref import build_reference_model, reference_embedding
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.utils.torch_compat import rules_for, torch_to_flax_variables

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _parity(model_name, tol=2e-4, cos_tol=1e-6, B=2, T=200, F=80,
            ref_kwargs=None, **kwargs):
    rkw = dict(kwargs) if ref_kwargs is None else dict(ref_kwargs)
    ref_model = build_reference_model(model_name, feat_dim=F, **rkw) \
        if ref_kwargs is None else build_reference_model(model_name, **rkw)
    x = np.random.default_rng(0).normal(size=(B, T, F)).astype(np.float32)
    want = reference_embedding(ref_model, x)

    model = get_speaker_model(model_name)(feat_dim=F, **kwargs)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, F)))
    variables = torch_to_flax_variables(ref_model.state_dict(), variables,
                                        rules=rules_for(model_name))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert got.shape == want.shape
    cos = np.sum(got * want, axis=-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=cos_tol)
    np.testing.assert_allclose(got, want, atol=tol, rtol=1e-3)


def _frame_feat_parity(model_name, tol=2e-4, B=2, T=200, F=80, **kwargs):
    """Public frame-level feature API parity: our return_frame_feat=True
    must match the reference's model.get_frame_level_feat(x) — same (B,T,D)
    layout including the transpose(1,3)+flatten d-ordering of the 2D
    models (e.g. wespeaker/models/resnet.py:174-180)."""
    import torch
    ref_model = build_reference_model(model_name, feat_dim=F, **kwargs)
    x = np.random.default_rng(0).normal(size=(B, T, F)).astype(np.float32)
    with torch.no_grad():
        want = ref_model.get_frame_level_feat(torch.from_numpy(x)).numpy()

    model = get_speaker_model(model_name)(feat_dim=F, **kwargs)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, F)))
    variables = torch_to_flax_variables(ref_model.state_dict(), variables,
                                        rules=rules_for(model_name))
    got = np.asarray(model.apply(variables, jnp.asarray(x),
                                 return_frame_feat=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=tol, rtol=1e-3)


@pytest.mark.parametrize("name,kwargs", [
    ("ECAPA_TDNN_GLOB_c512", dict(embed_dim=192)),
    ("XVEC", dict(embed_dim=512)),
    ("ResNet34", dict(embed_dim=256)),
    ("Res2Net34_Base", dict(embed_dim=192)),
    ("ERes2Net34_Base", dict(embed_dim=192)),
    ("Gemini_DF_ResNet60", dict(embed_dim=128)),
    ("REPVGG_TINY_A0", dict(embed_dim=256)),
    ("CAMPPlus", dict(embed_dim=192)),
])
def test_frame_level_feat_parity(name, kwargs):
    _frame_feat_parity(name, **kwargs)


def test_frame_level_feat_parity_redimnet():
    _frame_feat_parity("ReDimNetB0", embed_dim=192, F=60, T=120)


@pytest.mark.parametrize("glob_att", [False, True])
def test_ecapa_c512(glob_att):
    name = "ECAPA_TDNN_GLOB_c512" if glob_att else "ECAPA_TDNN_c512"
    _parity(name, embed_dim=192)


def test_ecapa_c1024():
    _parity("ECAPA_TDNN_c1024", embed_dim=192)


@pytest.mark.parametrize("two_emb", [False, True])
def test_resnet34(two_emb):
    _parity("ResNet34", embed_dim=256, two_emb_layer=two_emb)


def test_resnet50_bottleneck():
    _parity("ResNet50", embed_dim=256)


def test_resnet18():
    _parity("ResNet18", embed_dim=256)


def test_resnet34_astp():
    _parity("ResNet34", embed_dim=256, pooling_func="ASTP")


def test_xvec():
    _parity("XVEC", embed_dim=512)


@pytest.mark.parametrize("T", [200, 250])
def test_campplus(T):
    # T=250 exercises the partial (ceil-mode) final segment of seg_pooling
    _parity("CAMPPlus", embed_dim=512, T=T)


def test_eres2net_base():
    _parity("ERes2Net34_Base", embed_dim=192)


def test_eres2net_aug():
    _parity("ERes2Net34_aug", embed_dim=192, two_emb_layer=True)


def test_eres2net_large():
    # Large doubles the expansion over Base (eres2net.py:394-427)
    _parity("ERes2Net34_Large", embed_dim=192, T=150)


def test_res2net():
    _parity("Res2Net34_Base", embed_dim=192)


def test_gemini_dfresnet():
    _parity("Gemini_DF_ResNet60", embed_dim=128)


def test_gemini_dfresnet114():
    _parity("Gemini_DF_ResNet114", embed_dim=128, T=150)


def test_samresnet():
    # the reference constructor takes acoustic_dim, not feat_dim
    _parity("SimAM_ResNet34_ASP", embed_dim=256,
            ref_kwargs={"embed_dim": 256, "acoustic_dim": 80})


def test_xi_vec_ecapa():
    _parity("XI_VEC_ECAPA_TDNN_c512", embed_dim=192)


def test_xi_vec_xvec():
    _parity("XI_VEC_XVEC", embed_dim=512)


def test_repvgg_tiny_a0():
    _parity("REPVGG_TINY_A0", embed_dim=256)


def test_repvgg_rsbb():
    _parity("REPVGG_TINY_RSBB_A0", embed_dim=256)


def test_repvgg_se_and_groups():
    _parity("REPVGG_B1g2", embed_dim=256, use_se=True)


def test_repvgg_deploy_fusion_consistency():
    """Train-mode output == deploy-mode output after branch fusion, and both
    match the reference's switch_to_deploy conversion."""
    import jax.numpy as jnp
    from wespeaker_tpu.models.repvgg import (REPVGG_TINY_A0,
                                             convert_repvgg_variables)

    ref_model = build_reference_model("REPVGG_TINY_A0", feat_dim=80,
                                      embed_dim=256)
    x = np.random.default_rng(0).normal(size=(2, 200, 80)).astype(np.float32)
    want = reference_embedding(ref_model, x)

    model = REPVGG_TINY_A0(feat_dim=80, embed_dim=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)))
    from wespeaker_tpu.utils.torch_compat import (rules_for,
                                                  torch_to_flax_variables)
    variables = torch_to_flax_variables(ref_model.state_dict(), variables,
                                        rules=rules_for("REPVGG"))
    train_out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(train_out, want, atol=2e-4, rtol=1e-3)

    deploy_model = REPVGG_TINY_A0(feat_dim=80, embed_dim=256, deploy=True)
    deploy_vars = convert_repvgg_variables(variables)
    deploy_out = np.asarray(deploy_model.apply(deploy_vars, jnp.asarray(x)))
    np.testing.assert_allclose(deploy_out, train_out, atol=2e-3, rtol=1e-3)

    # cross-check against the reference's own fusion
    from tests.torch_ref import import_reference_module
    rmod = import_reference_module("wespeaker.models.repvgg")
    ref_deploy = rmod.repvgg_model_convert(ref_model)
    want_deploy = reference_embedding(ref_deploy, x)
    np.testing.assert_allclose(deploy_out, want_deploy, atol=2e-3, rtol=1e-3)


def test_whisper_pmfa_head():
    _parity("whisper_PMFA_large_v2", embed_dim=192, F=64, T=100)


def test_whisper_encoder_parity():
    """Tiny AudioEncoder vs the reference's vendored implementation."""
    import jax.numpy as jnp
    from tests.torch_ref import import_reference_module
    from wespeaker_tpu.frontend.whisper_encoder import AudioEncoder
    from wespeaker_tpu.utils.torch_compat import (rules_for,
                                                  torch_to_flax_variables)
    import torch

    rmod = import_reference_module("wespeaker.frontend.whisper_encoder")
    torch.manual_seed(0)
    ref = rmod.AudioEncoder(n_mels=24, n_ctx=50, n_state=32, n_head=4,
                            n_layer=3, layer_st=1, layer_ed=2).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    x = np.random.default_rng(0).normal(size=(2, 100, 24)).astype(np.float32)
    with torch.no_grad():
        # the reference forward permutes (B, T, n_mels) itself (:189)
        want = ref(torch.from_numpy(x)).numpy()

    model = AudioEncoder(n_mels=24, n_ctx=50, n_state=32, n_head=4,
                         n_layer=3, layer_st=1, layer_ed=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 24)))
    variables = torch_to_flax_variables(ref.state_dict(), variables,
                                        rules=rules_for("WhisperEncoder"))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_redimnet_b0():
    # basic_resnet blocks + conv_exp != 1 squeeze-back path
    _parity("ReDimNetB0", embed_dim=192, F=60, T=120)


def test_redimnet_b1():
    # convnext_like blocks, grouped convs
    _parity("ReDimNetB1", embed_dim=192, F=72, T=120)


def test_redimnet_b3_fwse():
    _parity("ReDimNetB3", embed_dim=192, F=72, T=96, tol=5e-4)


def test_bigru_matches_torch_gru():
    """Converted torch nn.GRU weights reproduce torch's bidirectional GRU
    (run over the time axis, i.e. the reference block's intended math)."""
    import torch
    import jax.numpy as jnp
    from wespeaker_tpu.models.redimnet import BiGRU
    from wespeaker_tpu.utils.torch_compat import torch_to_flax_variables

    torch.manual_seed(0)
    tg = torch.nn.GRU(input_size=6, hidden_size=5, num_layers=1, bias=True,
                      batch_first=True, bidirectional=True).eval()
    x = np.random.default_rng(0).normal(size=(2, 9, 6)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x))[0].numpy()  # (B, T, 2H)

    model = BiGRU(5)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 6)))
    sd = {f"gru.{k}": v for k, v in tg.state_dict().items()}
    variables = torch_to_flax_variables(sd, variables)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bigru_torch_quirk_matches_reference_bug():
    """gru_quirk_compat replicates the reference's batch_first quirk
    bit-for-bit: torch nn.GRU(batch_first=False) fed (B, T, C) recurs over
    the batch axis (wespeaker/models/redimnet.py:107-115)."""
    import torch
    import jax.numpy as jnp
    from wespeaker_tpu.models.redimnet import BiGRU
    from wespeaker_tpu.utils.torch_compat import torch_to_flax_variables

    torch.manual_seed(0)
    tg = torch.nn.GRU(input_size=6, hidden_size=5, num_layers=1, bias=True,
                      batch_first=False, bidirectional=True).eval()
    x = np.random.default_rng(0).normal(size=(4, 9, 6)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x))[0].numpy()  # quirk: seq axis = B

    model = BiGRU(5, torch_quirk=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 9, 6)))
    sd = {f"gru.{k}": v for k, v in tg.state_dict().items()}
    variables = torch_to_flax_variables(sd, variables)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_redimnet_gru_time_context_block():
    """'gru' variant recurs over time: permuting the batch must not change
    per-sample outputs (the reference's batch_first quirk would)."""
    import jax.numpy as jnp
    from wespeaker_tpu.models.redimnet import TimeContextBlock1d

    block = TimeContextBlock1d(C=24, hC=12, block_type="gru")
    x = np.random.default_rng(0).normal(size=(3, 20, 24)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(block.apply(variables, jnp.asarray(x)))
    assert y.shape == x.shape and np.isfinite(y).all()
    y_perm = np.asarray(block.apply(variables, jnp.asarray(x[::-1])))
    np.testing.assert_allclose(y_perm, y[::-1], atol=1e-5)


def test_w2vbert_adapter_mfa():
    import torch
    import jax.numpy as jnp
    from tests.torch_ref import import_reference_module
    from wespeaker_tpu.models.w2vbert_adapter_mfa import W2VBert_Adapter_MFA
    from wespeaker_tpu.utils.torch_compat import (rules_for,
                                                  torch_to_flax_variables)

    rmod = import_reference_module("wespeaker.models.w2vbert_adapter_mfa")
    torch.manual_seed(0)
    ref = rmod.W2VBert_Adapter_MFA(feat_dim=48, embed_dim=32,
                                   n_mfa_layers=3, adapter_dim=16,
                                   num_frontend_hidden_layers=4).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    rng = np.random.default_rng(0)
    states = [rng.normal(size=(2, 50, 48)).astype(np.float32)
              for _ in range(5)]
    with torch.no_grad():
        want = ref(tuple(torch.from_numpy(s) for s in states))[-1].numpy()

    model = W2VBert_Adapter_MFA(feat_dim=48, embed_dim=32, n_mfa_layers=3,
                                adapter_dim=16, num_frontend_hidden_layers=4)
    jstates = [jnp.asarray(s) for s in states]
    variables = model.init(jax.random.PRNGKey(0), jstates)
    variables = torch_to_flax_variables(
        ref.state_dict(), variables, rules=rules_for("W2VBert_Adapter_MFA"))
    got = np.asarray(model.apply(variables, jstates))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _parity_redimnet2(name, T=96, F=72):
    """ReDimNet2Wrap takes (B, F, T) spectrograms in torch; ours takes
    (B, T, F)."""
    import torch
    import jax.numpy as jnp
    from tests.torch_ref import import_reference_module
    from wespeaker_tpu.models import get_speaker_model
    from wespeaker_tpu.utils.torch_compat import (rules_for,
                                                  torch_to_flax_variables)

    rmod = import_reference_module("wespeaker.models.redimnet2")
    torch.manual_seed(0)
    ref = getattr(rmod, name)(feat_dim=F, embed_dim=96).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    1.0 + 0.5 * torch.rand(m.running_var.shape,
                                           generator=gen))

    x = np.random.default_rng(0).normal(size=(2, T, F)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    model = get_speaker_model(name)(feat_dim=F, embed_dim=96)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, F)))
    variables = torch_to_flax_variables(ref.state_dict(), variables,
                                        rules=rules_for("ReDimNet2"))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    cos = np.sum(got * want, -1) / (np.linalg.norm(got, axis=-1)
                                    * np.linalg.norm(want, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_redimnet2_b0():
    _parity_redimnet2("ReDimNet2B0")


def test_redimnet2_b6():
    # 2d output head, fractional conv_exp, gcd-grouped tconvs
    _parity_redimnet2("ReDimNet2B6")


def test_redimnet2_b2_rect_kernels():
    # (3,5)/(3,7) convnext kernels + freq stride 3 stage
    _parity_redimnet2("ReDimNet2B2")


@pytest.mark.parametrize("pool", ["TAP", "TSDP", "MHASTP", "MQMHASTP"])
def test_resnet_pooling_variants(pool):
    _parity("ResNet18", embed_dim=128, pooling_func=pool, T=120)
