"""Released-checkpoint loading path, end to end.

The released pix2pix3D checkpoints are torch pickles of LIVE persistence-
decorated modules (`training_loop.py:720-737`, `persistence.py:37-99`).  No
checkpoint files ship in this offline environment, so this test CREATES one
in exactly that format from the reference code, then exercises our loader:

    reference model -> pickle.dump({'G_ema': module}) ->
    load_reference_pickle (restricted unpickler, no code execution) ->
    convert_state_dict -> our generator -> forward parity.
"""

import io
import pickle
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu.utils.convert import load_reference_pickle, convert_state_dict
from tests.test_parity_e2e import RENDER_KW, COMMON, Z_DIM, SEM, NRR

torch.manual_seed(0)


@pytest.mark.slow
def test_reference_pickle_roundtrip(tmp_path, monkeypatch):
    from training import triplane_cond as ref_tc
    from pix2pix3d_tpu.models import build_generator

    mapping_kwargs = dict(num_layers=2, in_resolution=16, in_channels=SEM)
    sr_kwargs = dict(channel_base=2048, channel_max=32)
    ref_g = ref_tc.TriPlaneSemanticEntangleGenerator(
        mapping_kwargs=dict(
            class_name="training.triplane_cond.MaskMappingNetwork_disentangle",
            **mapping_kwargs),
        rendering_kwargs=dict(RENDER_KW),
        sr_kwargs=dict(sr_kwargs, fused_modconv_default=False),
        fused_modconv_default=False,
        **COMMON)
    ref_g.eval()

    # Snapshot in the reference's released format (persistence pickles).
    pkl_path = tmp_path / "snapshot.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"G_ema": ref_g, "training_set_kwargs": {"d": 1}}, f)

    modules = load_reference_pickle(str(pkl_path))
    assert "G_ema" in modules
    state = modules["G_ema"]
    # spot-check a few expected parameter names survived extraction
    assert any(k.startswith("backbone.synthesis.b4.conv1.weight")
               for k in state)
    assert any("superresolution_semantic" in k for k in state)

    rk = dict(RENDER_KW)
    rk["superresolution_module"] = "SuperresolutionHybrid2X"
    rk["superresolution_module_semantic"] = "SuperresolutionHybrid2X_semantic"
    ours = build_generator(
        class_name="TriPlaneSemanticEntangleGenerator",
        mapping_kwargs=dict(class_name="MaskMappingNetwork_disentangle",
                            **mapping_kwargs),
        rendering_kwargs=rk, sr_kwargs=sr_kwargs, **COMMON)
    params = convert_state_dict(state, ours.init(jax.random.PRNGKey(0)))

    # forward parity through the pickle-loaded weights
    rng = np.random.RandomState(0)
    z = rng.randn(1, Z_DIM).astype(np.float32)
    mask = rng.randint(0, SEM, size=(1, 1, 16, 16)).astype(np.float32)
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=1)
    pose = np.asarray(pose_to_conditioning(c2w, fov_to_intrinsics(18.837)))

    monkeypatch.setattr(torch, "rand_like", lambda t: torch.zeros_like(t))
    real_linspace = torch.linspace

    def fake_rand(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], tuple):
            shape = shape[0]
        nr, ni = shape
        return real_linspace(0, 1, ni).expand(nr, ni).contiguous()
    monkeypatch.setattr(torch, "rand", fake_rand)

    with torch.no_grad():
        ws_t = ref_g.mapping(torch.from_numpy(z), torch.from_numpy(pose),
                             {"mask": torch.from_numpy(mask)})
        want = ref_g.synthesis(ws_t, torch.from_numpy(pose),
                               neural_rendering_resolution=NRR,
                               noise_mode="const")["image"].numpy()

    got = ours.synthesis(params, jnp.asarray(ws_t.numpy()), jnp.asarray(pose),
                         neural_rendering_resolution=NRR, noise_mode="const",
                         det=True)["image"]
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_restricted_unpickler_blocks_code():
    """The loader must not execute arbitrary callables in the pickle."""
    class Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').system('echo pwned > /tmp/pwned')",))

    buf = io.BytesIO()
    pickle.dump({"G": Evil()}, buf)
    path = "/tmp/evil_test.pkl"
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    import os
    if os.path.exists("/tmp/pwned"):
        os.remove("/tmp/pwned")
    try:
        load_reference_pickle(path)
    except Exception:
        pass  # refusing to load at all is acceptable
    assert not os.path.exists("/tmp/pwned"), "unpickler executed embedded code!"


def test_restricted_unpickler_blocks_load_from_bytes_payload(tmp_path):
    """`torch.storage._load_from_bytes` is torch.load WITHOUT weights_only —
    a full pickle load.  An evil payload routed through it must not execute
    (the loader shims it with torch.load(weights_only=True))."""
    import os
    import pickletools  # noqa: F401  (documentation aid)

    sentinel = "/tmp/pwned_lfb"
    evil_inner = pickle.dumps(EvilInner())

    class Wrapper:
        def __reduce__(self):
            # emulate a legacy torch tensor whose storage bytes are an
            # attacker-controlled pickle
            import torch.storage
            return (torch.storage._load_from_bytes, (evil_inner,))

    if os.path.exists(sentinel):
        os.remove(sentinel)
    path = tmp_path / "evil_lfb.pkl"
    with open(path, "wb") as f:
        pickle.dump({"G": Wrapper()}, f)
    try:
        load_reference_pickle(str(path))
    except Exception:
        pass  # raising on the malicious payload is the expected outcome
    assert not os.path.exists(sentinel), \
        "payload behind _load_from_bytes executed!"


class EvilInner:
    def __reduce__(self):
        return (eval,
                ("__import__('os').system('echo pwned > /tmp/pwned_lfb')",))
