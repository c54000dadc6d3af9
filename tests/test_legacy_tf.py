"""Legacy TensorFlow pickle conversion (ref `legacy.py:24-60,75-291`).

Fabricates a miniature StyleGAN2-ADA TF pickle — a (G, D, Gs) tuple of
`dnnlib.tflib.network.Network` objects with TF-layout variables — and
checks that `utils.legacy_tf` infers the right kwargs, maps every
parameter (transposes, up-conv flips, mod_bias+1, noise renumbering), and
produces runnable networks.  Also checks the loader stays restricted.
"""

import io
import pickle
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

W_DIM = 32
RES = 16
CH = 32  # uniform channel count: fmap_base=256 -> channel_base=512, max 32


_FAKE_MODULES = ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network")
_SAVED_MODULES = {}


def _install_fake_tflib():
    # the reference's real dnnlib may already be imported (parity tests);
    # save and restore it so fabricating the pickle has no side effects
    _SAVED_MODULES.update({m: sys.modules.get(m) for m in _FAKE_MODULES})
    dnnlib = types.ModuleType("dnnlib")
    tflib = types.ModuleType("dnnlib.tflib")
    network = types.ModuleType("dnnlib.tflib.network")

    class Network:
        pass

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    network.Network = Network
    dnnlib.tflib = tflib
    tflib.network = network
    sys.modules["dnnlib"] = dnnlib
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules["dnnlib.tflib.network"] = network
    return Network


def _rm_fake_tflib():
    for m in _FAKE_MODULES:
        saved = _SAVED_MODULES.get(m)
        if saved is not None:
            sys.modules[m] = saved
        else:
            sys.modules.pop(m, None)


def _tf_generator_state(rng):
    def v(*shape):
        return rng.randn(*shape).astype(np.float32)

    variables = [("dlatent_avg", v(W_DIM))]
    comp_mapping = [(f"Dense{i}/{p}", v(W_DIM, W_DIM) if p == "weight"
                     else v(W_DIM)) for i in range(2) for p in ("weight", "bias")]
    syn = [("4x4/Const/const", v(1, CH, 4, 4)),
           ("noise0", v(1, 1, 4, 4))]
    for prefix, noise_res in [("4x4/Conv", None)]:
        syn += [(f"{prefix}/weight", v(3, 3, CH, CH)),
                (f"{prefix}/bias", v(CH)),
                (f"{prefix}/mod_weight", v(W_DIM, CH)),
                (f"{prefix}/mod_bias", v(CH)),
                (f"{prefix}/noise_strength", np.float32(rng.randn()))]
    syn += [("4x4/ToRGB/weight", v(1, 1, CH, 3)), ("4x4/ToRGB/bias", v(3)),
            ("4x4/ToRGB/mod_weight", v(W_DIM, CH)),
            ("4x4/ToRGB/mod_bias", v(CH))]
    ni = 1
    for res in (8, 16):
        syn += [(f"noise{ni}", v(1, 1, res, res)),
                (f"noise{ni + 1}", v(1, 1, res, res))]
        ni += 2
        for conv in ("Conv0_up", "Conv1"):
            syn += [(f"{res}x{res}/{conv}/weight", v(3, 3, CH, CH)),
                    (f"{res}x{res}/{conv}/bias", v(CH)),
                    (f"{res}x{res}/{conv}/mod_weight", v(W_DIM, CH)),
                    (f"{res}x{res}/{conv}/mod_bias", v(CH)),
                    (f"{res}x{res}/{conv}/noise_strength",
                     np.float32(rng.randn()))]
        syn += [(f"{res}x{res}/ToRGB/weight", v(1, 1, CH, 3)),
                (f"{res}x{res}/ToRGB/bias", v(3)),
                (f"{res}x{res}/ToRGB/mod_weight", v(W_DIM, CH)),
                (f"{res}x{res}/ToRGB/mod_bias", v(CH))]

    def net(variables, components=None, **static_kwargs):
        return dict(version=4, name="G", static_kwargs=static_kwargs,
                    variables=variables, components=components or {})

    return dict(
        version=4, name="G",
        static_kwargs=dict(latent_size=W_DIM, dlatent_size=W_DIM,
                           resolution=RES, num_channels=3, fmap_base=256,
                           fmap_max=CH, mapping_layers=2, mapping_fmaps=W_DIM),
        variables=variables,
        components={"mapping": _as_net(comp_mapping),
                    "synthesis": _as_net(syn)},
    )


class _StateCarrier:
    """Instance whose pickled state is exactly the given dict."""

    def __init__(self, state):
        self.__dict__.update(state)


def _as_net(variables, **static_kwargs):
    return dict(version=4, name="sub", static_kwargs=static_kwargs,
                variables=list(variables), components={})


def _tf_discriminator_state(rng):
    def v(*shape):
        return rng.randn(*shape).astype(np.float32)

    variables = []
    for res in (16, 8):
        if res == RES:
            variables += [(f"{res}x{res}/FromRGB/weight", v(1, 1, 3, CH)),
                          (f"{res}x{res}/FromRGB/bias", v(CH))]
        variables += [(f"{res}x{res}/Conv0/weight", v(3, 3, CH, CH)),
                      (f"{res}x{res}/Conv0/bias", v(CH)),
                      (f"{res}x{res}/Conv1_down/weight", v(3, 3, CH, CH)),
                      (f"{res}x{res}/Conv1_down/bias", v(CH)),
                      (f"{res}x{res}/Skip/weight", v(1, 1, CH, CH))]
    variables += [("4x4/Conv/weight", v(3, 3, CH + 1, CH)),
                  ("4x4/Conv/bias", v(CH)),
                  ("4x4/Dense0/weight", v(CH * 16, CH)),
                  ("4x4/Dense0/bias", v(CH)),
                  ("Output/weight", v(CH, 1)), ("Output/bias", v(1))]
    return dict(
        version=4, name="D",
        static_kwargs=dict(resolution=RES, num_channels=3, fmap_base=256,
                           fmap_max=CH, mbstd_group_size=2),
        variables=variables, components={})


def _make_tf_pickle():
    Network = _install_fake_tflib()
    rng = np.random.RandomState(0)

    def wrap(state):
        obj = Network.__new__(Network)
        # components must themselves unpickle as Network stubs
        comps = {k: wrap_dict(v) for k, v in state["components"].items()}
        obj.__dict__.update(dict(state, components=comps))
        return obj

    def wrap_dict(state):
        obj = Network.__new__(Network)
        obj.__dict__.update(state)
        return obj

    g_state = _tf_generator_state(rng)
    d_state = _tf_discriminator_state(rng)
    gs_state = _tf_generator_state(np.random.RandomState(1))
    data = (wrap(g_state), wrap(d_state), wrap(gs_state))
    buf = pickle.dumps(data)
    _rm_fake_tflib()
    return buf, g_state, d_state


@pytest.fixture(scope="module")
def tf_pickle():
    return _make_tf_pickle()


def test_load_and_convert_generator(tf_pickle):
    from pix2pix3d_tpu.utils.legacy_tf import load_legacy_tf_networks
    buf, g_state, _ = tf_pickle
    nets = load_legacy_tf_networks(io.BytesIO(buf))
    kwargs, params = nets["G"]
    assert kwargs["img_resolution"] == RES
    assert kwargs["channel_base"] == 512  # fmap_base * 2 (legacy.py:129)
    assert kwargs["mapping_kwargs"]["num_layers"] == 2

    tfp = {f"mapping/{n}": np.asarray(v) for n, v in
           g_state["components"]["mapping"]["variables"]}
    tfp.update({f"synthesis/{n}": np.asarray(v) for n, v in
                g_state["components"]["synthesis"]["variables"]})
    tfp.update({n: np.asarray(v) for n, v in g_state["variables"]})

    # FC: ours is [in, out] = TF layout verbatim
    np.testing.assert_allclose(
        np.asarray(params["mapping"]["fc0"]["weight"]),
        tfp["mapping/Dense0/weight"], rtol=1e-6)
    # modulation bias +1 (legacy.py:189)
    np.testing.assert_allclose(
        np.asarray(params["synthesis"]["b4"]["conv1"]["affine"]["bias"]),
        tfp["synthesis/4x4/Conv/mod_bias"] + 1, rtol=1e-6)
    # up-conv: TF HWIO spatially flipped, channel order kept
    np.testing.assert_allclose(
        np.asarray(params["synthesis"]["b8"]["conv0"]["weight"]),
        tfp["synthesis/8x8/Conv0_up/weight"][::-1, ::-1], rtol=1e-6)
    # noise renumbering: b8.conv1 <- noise{2*3-4}=noise2 (legacy.py:193)
    np.testing.assert_allclose(
        np.asarray(params["synthesis"]["b8"]["conv1"]["noise_const"]),
        tfp["synthesis/noise2"][0, 0], rtol=1e-6)
    # const [1, C, 4, 4] -> [4, 4, C]
    np.testing.assert_allclose(
        np.asarray(params["synthesis"]["b4"]["const"]),
        tfp["synthesis/4x4/Const/const"][0].transpose(1, 2, 0), rtol=1e-6)


def test_converted_networks_run(tf_pickle):
    from pix2pix3d_tpu.utils.legacy_tf import load_legacy_tf_networks
    from pix2pix3d_tpu.nn.synthesis import Generator
    from pix2pix3d_tpu.nn.discriminator import Discriminator
    buf, _, _ = tf_pickle
    nets = load_legacy_tf_networks(io.BytesIO(buf))

    g_kwargs, g_params = nets["G_ema"]
    G = Generator(**g_kwargs)
    img = G(g_params, jnp.ones((2, W_DIM)) * 0.1, None, noise_mode="const")
    assert img.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()

    d_kwargs, d_params = nets["D"]
    D = Discriminator(**d_kwargs)
    logits = D(d_params, img, None)
    assert logits.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_rejects_low_version(tf_pickle):
    from pix2pix3d_tpu.utils import legacy_tf
    buf, _, _ = tf_pickle
    g, d, gs = legacy_tf.load_tf_pickle(io.BytesIO(buf))
    g.state["version"] = 3
    with pytest.raises(ValueError, match="version too low"):
        legacy_tf.convert_tf_generator(g)


def test_rejects_unknown_kwarg(tf_pickle):
    from pix2pix3d_tpu.utils import legacy_tf
    buf, _, _ = tf_pickle
    g, _, _ = legacy_tf.load_tf_pickle(io.BytesIO(buf))
    g.state["static_kwargs"]["totally_new_option"] = 1
    with pytest.raises(ValueError, match="unknown TensorFlow kwarg"):
        legacy_tf.convert_tf_generator(g)


def test_loader_is_restricted():
    from pix2pix3d_tpu.utils.legacy_tf import load_tf_pickle

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    buf = pickle.dumps((Evil(), Evil(), Evil()))
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_tf_pickle(io.BytesIO(buf))
