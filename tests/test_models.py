"""Model family shape/behavior tests (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data import InputDataKeys, OutputDataKeys, total_input_width
from inferbiomechanics_tpu.data.keys import input_channel_widths
from inferbiomechanics_tpu.models import get_model

NUM_DOFS, NB, HIST, STRIDE, RH = 23, 2, 50, 5, 10
W = HIST // STRIDE
C_IN = total_input_width(NUM_DOFS, RH)


def _packed_batch(b=4):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(b, W, C_IN)).astype(np.float32))


def _dict_batch(b=4):
    rng = np.random.default_rng(0)
    widths = input_channel_widths(NUM_DOFS, RH)
    return {k: jnp.asarray(rng.normal(size=(b, W, w)).astype(np.float32))
            for k, w in widths.items()}


def _build(model_type, **kw):
    model = get_model(model_type, num_dofs=NUM_DOFS, num_contact_bodies=NB,
                      history_len=HIST, stride=STRIDE, root_history_len=RH, **kw)
    x = _packed_batch()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


@pytest.mark.parametrize('model_type', ['feedforward', 'groundlink', 'transformer'])
def test_output_shapes_last_frame(model_type):
    kw = {'output_data_format': 'last_frame'}
    model, variables, x = _build(model_type, **kw)
    out = model.apply(variables, x, train=False)
    assert out[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME].shape == (4, 1, 3 * NB)
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (4, 1, 3 * NB)
    assert out[OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME].shape == (4, 1, 3 * NB)
    assert out[OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME].shape == (4, 1, 6 * NB)
    for v in out.values():
        assert v.dtype == jnp.float32


@pytest.mark.parametrize('model_type', ['feedforward', 'groundlink', 'transformer'])
def test_output_shapes_all_frames(model_type):
    model, variables, x = _build(model_type, output_data_format='all_frames')
    out = model.apply(variables, x, train=False)
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (4, W, 3 * NB)


def test_dict_and_packed_inputs_agree():
    model, variables, _ = _build('feedforward')
    d = _dict_batch()
    from inferbiomechanics_tpu.models import pack_inputs
    packed = pack_inputs(d)
    out_d = model.apply(variables, d, train=False)
    out_p = model.apply(variables, packed, train=False)
    for k in out_d:
        np.testing.assert_allclose(np.asarray(out_d[k]), np.asarray(out_p[k]), atol=1e-6)


def test_transformer_aux_heads():
    model, variables, x = _build('transformer')
    out = model.apply(variables, x, train=False)
    assert out[OutputDataKeys.TAU].shape == (4, 1, NUM_DOFS)
    assert out[OutputDataKeys.COM_ACC_IN_ROOT_FRAME].shape == (4, 1, 3)
    assert out[OutputDataKeys.CONTACT].shape == (4, 1, NB)


def test_feedforward_batchnorm_dropout_train_mode():
    model = get_model('feedforward', num_dofs=NUM_DOFS, num_contact_bodies=NB,
                      history_len=HIST, stride=STRIDE, root_history_len=RH,
                      batchnorm=True, dropout=True, dropout_prob=0.5)
    x = _packed_batch()
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, train=False)
    assert 'batch_stats' in variables
    out, updates = model.apply(variables, x, train=True,
                               rngs={'dropout': jax.random.PRNGKey(2)},
                               mutable=['batch_stats'])
    assert 'batch_stats' in updates
    # dropout is stochastic in train mode
    out2 = model.apply(variables, x, train=True,
                       rngs={'dropout': jax.random.PRNGKey(3)},
                       mutable=['batch_stats'])[0]
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert not np.allclose(np.asarray(out[k]), np.asarray(out2[k]))


def test_groundlink_replicate_padding_keeps_length():
    model, variables, x = _build('groundlink', output_data_format='all_frames')
    out = model.apply(variables, x, train=False)
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape[1] == W


def test_groundlink_final_head_torch_default_init():
    """The output head keeps torch's default Linear init U(+-1/sqrt(256)),
    matching the reference's initialize(), which zips layers with their
    FOLLOWING activation and so never reaches the final un-activated
    Linear (Groundlink.py:79-105). Xavier-relu there made the init
    output scale ~3.3x larger and cost ~1.7x early-epoch CoP/COM-acc
    error (PARITY_RMSE.md)."""
    model, variables, x = _build('groundlink', output_data_format='all_frames')
    denses = [k for k in variables['params'] if k.startswith('Dense')]
    final = np.asarray(
        variables['params'][max(denses, key=lambda k: int(k.split('_')[-1]))]
        ['kernel'], np.float32)
    fan_in = final.shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(final).max() <= bound * 1.0001
    # uniform: var = bound^2/3; xavier-relu would give 2*2/(fan_in+30),
    # ~10x larger — assert we are on the uniform side
    assert final.var() < 2 * bound ** 2 / 3


def test_jit_forward():
    model, variables, x = _build('transformer')
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = f(variables, x)
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (4, 1, 6)


def test_short_window_attention_matches_reference_math():
    """VPU attention == standard softmax(QK^T/sqrt(dh))V with shared weights."""
    from inferbiomechanics_tpu.models.transformer import ShortWindowAttention
    rng = np.random.default_rng(0)
    B, T, D, H = 8, 10, 64, 4
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    attn = ShortWindowAttention(num_heads=H, compute_dtype=jnp.float32)
    v = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(v, x)
    # reference computation from the same qkv/proj params
    Wqkv = np.asarray(v['params']['qkv']['kernel'])
    bqkv = np.asarray(v['params']['qkv']['bias'])
    Wp = np.asarray(v['params']['proj']['kernel'])
    bp = np.asarray(v['params']['proj']['bias'])
    qkv = np.asarray(x) @ Wqkv + bqkv
    qkv = qkv.reshape(B, T, 3, H, D // H)
    q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = np.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(D // H)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum('bhqk,bkhd->bqhd', probs, vv).reshape(B, T, D) @ Wp + bp
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_transformer_attn_impls_agree():
    x = _packed_batch()
    from inferbiomechanics_tpu.models.transformer import TransformerRegressor
    kw = dict(num_dofs=NUM_DOFS, num_contact_bodies=NB, history_len=HIST,
              stride=STRIDE, compute_dtype=jnp.float32)
    m_vpu = TransformerRegressor(attn_impl='vpu', **kw)
    v = m_vpu.init(jax.random.PRNGKey(0), x, train=False)
    out = m_vpu.apply(v, x, train=False)
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert out[k].shape == (4, 1, 6)
    assert np.isfinite(np.asarray(out[k])).all()
    # flax impl still constructible and runs (different param structure)
    m_flax = TransformerRegressor(attn_impl='flax', **kw)
    v2 = m_flax.init(jax.random.PRNGKey(0), x, train=False)
    out2 = m_flax.apply(v2, x, train=False)
    assert out2[k].shape == (4, 1, 6)


def test_attn_checkpoint_conversion_equivalence():
    """flax <-> vpu attention parameterizations are the same layer: params
    converted with scripts/convert_attn_checkpoint.py give (near-)identical
    model outputs, both directions."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    from convert_attn_checkpoint import convert_params
    from inferbiomechanics_tpu.models import get_model

    H = 4
    kw = dict(num_dofs=23, num_contact_bodies=2, history_len=50, stride=5,
              root_history_len=10, d_model=64, num_layers=2, num_heads=H)
    m_flax = get_model('transformer', attn_impl='flax', **kw)
    m_vpu = get_model('transformer', attn_impl='vpu', **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (4, 10, 177)).astype(np.float32))
    v_flax = m_flax.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    ref = m_flax.apply(v_flax, x, train=False)

    p_vpu = convert_params(
        jax.tree_util.tree_map(np.asarray, v_flax['params']), 'vpu', H)
    got = m_vpu.apply({'params': p_vpu}, x, train=False)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        np.testing.assert_allclose(b, a, atol=2e-2 * (np.abs(a).max() + 1e-6),
                                   err_msg=f'flax->vpu head {k}')

    # and back: vpu -> flax must reproduce the original flax params
    p_back = convert_params(p_vpu, 'flax', H)
    for blk in [k for k in p_back if k.startswith('EncoderBlock_')]:
        orig = v_flax['params'][blk]['MultiHeadDotProductAttention_0']
        conv = p_back[blk]['MultiHeadDotProductAttention_0']
        for part in ('query', 'key', 'value', 'out'):
            np.testing.assert_allclose(np.asarray(conv[part]['kernel']),
                                       np.asarray(orig[part]['kernel']),
                                       atol=1e-7)


def test_groundlink_banded_conv_matches_xla_conv():
    """conv_impl='banded' (one matmul per conv layer, MXU lowering) is
    numerically equivalent to the nn.Conv + edge-pad path from the SAME
    parameters, including replicate-padding edge behavior. Shared param
    tree: checkpoints swap between the lowerings."""
    import jax
    import jax.numpy as jnp

    from inferbiomechanics_tpu.models import get_model

    kw = dict(num_dofs=23, num_contact_bodies=2, history_len=50, stride=5,
              root_history_len=10)
    from inferbiomechanics_tpu.models.groundlink import Groundlink
    # f32 so the comparison isn't dominated by bf16 noise
    kw = dict(kw, root_history_len=kw.pop('root_history_len'))
    del kw['history_len'], kw['stride']
    banded = Groundlink(conv_impl='banded', compute_dtype=jnp.float32, **kw)
    xla = Groundlink(conv_impl='xla', compute_dtype=jnp.float32, **kw)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 10, 177))
    params = banded.init(rng, x)['params']
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(xla.init(rng, x)['params'])
    out_b = banded.apply({'params': params}, x)
    out_x = xla.apply({'params': params}, x)
    for k in out_b:
        assert jnp.allclose(out_b[k], out_x[k], atol=2e-4), k
