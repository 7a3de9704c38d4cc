"""Torch -> Flax forward-pass numerical parity against the REAL reference.

Builds the actual reference torch models (`/root/reference/models/
fcnresnet.py:48-323`), runs a real forward, exports `state_dict()`, pulls it
through `import_torch_state_dict`, and asserts the Flax models produce the
same (seg, radial) maps to f32 tolerance. This is the bridge that makes
"ADD(s) parity with the PyTorch reference" (BASELINE.md) testable: any
unmapped checkpoint key, shape mismatch, or op divergence fails here.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rcvpose_tpu.checkpoint import import_torch_state_dict
from rcvpose_tpu.models import DenseFCNResNet152, ResFCNResNet152

REF_MODEL_PY = "/root/reference/models/fcnresnet.py"


@pytest.fixture(scope="module")
def ref_models():
    if not os.path.exists(REF_MODEL_PY):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_fcnresnet",
                                                  REF_MODEL_PY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _import_and_check_complete(torch_model, flax_model, hw):
    """Import the torch state dict and assert the resulting variable tree is
    EXACTLY the Flax init tree: no missing, no extra, no shape mismatch."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = import_torch_state_dict(sd)

    init_vars = jax.eval_shape(
        lambda: flax_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, *hw, 3), jnp.float32), False))
    flat_init = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
                 jax.tree_util.tree_flatten_with_path(init_vars)[0]}
    flat_imp = {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert set(flat_init) == set(flat_imp), (
        sorted(set(flat_init) ^ set(flat_imp))[:10])
    mismatch = {k: (flat_init[k], flat_imp[k])
                for k in flat_init if flat_init[k] != flat_imp[k]}
    assert not mismatch, dict(list(mismatch.items())[:5])
    return variables


def _forward_parity(torch_model, flax_model, hw, seed, atol=1e-5):
    variables = _import_and_check_complete(torch_model, flax_model, hw)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, 3, *hw)).astype(np.float32)
    with torch.no_grad():
        tseg, trad = torch_model(torch.from_numpy(x))
    fseg, frad = jax.jit(lambda v, im: flax_model.apply(v, im, False))(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(fseg),
                               np.transpose(tseg.numpy(), (0, 2, 3, 1)),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(frad),
                               np.transpose(trad.numpy(), (0, 2, 3, 1)),
                               atol=atol)


def test_dense_fcn_torch_parity_128(ref_models):
    torch.manual_seed(0)
    tm = ref_models.DenseFCNResNet152(3, 2).eval()
    _forward_parity(tm, DenseFCNResNet152(), (128, 128), seed=0)


def test_res_fcn_torch_parity_64(ref_models):
    # double_up1=False IS the reference forward: its two up1 calls are the
    # 5 ladder upsamples H/32 -> H (fcnresnet.py:295-313).
    torch.manual_seed(1)
    tm = ref_models.ResFCNResNet152(3, 2).eval()
    _forward_parity(tm, ResFCNResNet152(double_up1=False), (64, 64), seed=1)


def test_dense_fcn_torch_parity_480x640(ref_models):
    # ~30 s on the single-core CI box — the slowest test in the suite, kept
    # on because it is the only full-LINEMOD-resolution parity proof
    torch.manual_seed(2)
    tm = ref_models.DenseFCNResNet152(3, 2).eval()
    # wider tolerance: 18.75x more pixels accumulate more f32 reassociation
    _forward_parity(tm, DenseFCNResNet152(), (480, 640), seed=2, atol=1e-4)


def test_export_round_trip_and_torch_load(ref_models):
    """Flax -> torch export: the inverse bridge must reproduce the original
    state dict bit-exactly AND load into a live reference model."""
    from rcvpose_tpu.checkpoint import export_torch_state_dict

    torch.manual_seed(3)
    tm = ref_models.DenseFCNResNet152(3, 2).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = import_torch_state_dict(sd)
    back = export_torch_state_dict(variables, sd.keys())
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            assert k not in back
            continue
        if k not in back:
            # dead reference params: non-projecting Bottlenecks allocate an
            # unused upsample_ shortcut (reference fcnresnet.py:16-18,35-36)
            assert "upsample_" in k, k
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)

    # exported dict loads into a FRESH reference model (strict on weights)
    tm2 = ref_models.DenseFCNResNet152(3, 2).eval()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in back.items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m or "upsample_" in m
               for m in missing)
    x = torch.from_numpy(np.random.default_rng(3).normal(
        size=(1, 3, 64, 64)).astype(np.float32))
    with torch.no_grad():
        a = tm(x)[1].numpy()
        b = tm2(x)[1].numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_export_mismatched_architecture_fails_loudly(ref_models):
    """Exporting variables from a non-reference architecture (shallow
    blocks) must raise, not silently emit a partial state dict that
    load_state_dict(strict=False) would accept with random weights."""
    from rcvpose_tpu.checkpoint import export_torch_state_dict

    torch.manual_seed(4)
    tm = ref_models.DenseFCNResNet152(3, 2).eval()
    shallow = DenseFCNResNet152(blocks=(1, 1, 1, 1))
    variables = shallow.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    with pytest.raises(KeyError, match="architecture"):
        export_torch_state_dict(variables, tm.state_dict().keys())
