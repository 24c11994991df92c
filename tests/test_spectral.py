"""Hero-wavelength spectral mode (integrators/spectral.py +
core/spectrum.py): colorimetry identities, the gray furnace (exact under
the partition-of-unity upsampling), and agreement with the RGB renderer on
a colored scene."""
import numpy as np

import jax.numpy as jnp

from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.core import spectrum as sp
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.spectral import (
    SpectralIntegrator,
    render_spectral,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.scene import mesh as meshlib


def test_wavelength_sampling_and_upsampling_identities():
    u = jnp.linspace(0.0, 0.999, 64)
    lam, pdf = sp.sample_wavelengths(u, 4)
    assert lam.shape == (64, 4)
    assert bool(jnp.all((lam >= sp.LAMBDA_MIN) & (lam < sp.LAMBDA_MAX + 1)))
    np.testing.assert_allclose(np.asarray(pdf),
                               1.0 / (sp.LAMBDA_MAX - sp.LAMBDA_MIN))
    # gray upsamples to the exact constant (partition of unity)
    g = sp.upsample_rgb(jnp.full((1, 3), 0.37), lam[:1])
    np.testing.assert_allclose(np.asarray(g), 0.37, rtol=1e-5)
    # CMF y-bar is nonnegative and the equal-energy spectrum has Y = 1
    w = sp.spectrum_to_xyz_weight(lam, pdf, 4)         # (64, 4, 3)
    Y = np.asarray(jnp.sum(w[..., 1], axis=1))
    assert Y.min() > 0
    assert abs(Y.mean() - 1.0) < 0.02                  # MC over 64 heroes


def test_equal_energy_white_maps_to_gray():
    # a flat spectrum of unit radiance -> XYZ with Y=1 -> balanced sRGB gray
    u = jnp.linspace(0.0, 0.999, 4096)
    lam, pdf = sp.sample_wavelengths(u, 4)
    w = sp.spectrum_to_xyz_weight(lam, pdf, 4)
    xyz = jnp.sum(w, axis=1).mean(axis=0)              # MC integral, flat L=1
    rgb = np.asarray(sp.xyz_to_srgb(xyz[None, None, :]))[0, 0]
    np.testing.assert_allclose(rgb, 1.0, rtol=0.02)


def _furnace_scene(albedo=0.6, L=2.0, res=16):
    enclosure = meshlib.sphere(radius=10.0, n_theta=16, n_phi=32)
    enc_faces = enclosure.faces[:, ::-1].copy()
    obj = meshlib.sphere(radius=1.0, n_theta=16, n_phi=32)
    return {
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 20.0,
            "to_world": m.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0]),
            "film": {"width": res, "height": res},
        },
        "enclosure": {
            "type": "mesh", "vertices": enclosure.vertices,
            "faces": enc_faces,
            "bsdf": {"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]},
            "emitter": {"type": "area", "radiance": [L, L, L]},
        },
        "object": {
            "type": "mesh", "vertices": obj.vertices, "faces": obj.faces,
            "bsdf": {"type": "diffuse", "reflectance": [albedo] * 3},
        },
    }


def test_spectral_gray_furnace():
    """Gray albedo + gray emitter: the upsampled spectra are flat, so the
    spectral estimator must reproduce the analytic furnace value after the
    CIE pipeline (equal-energy white balance makes flat -> gray exact)."""
    albedo, L = 0.6, 2.0
    scene, _ = load_dict(_furnace_scene(albedo, L))
    img = np.asarray(render_spectral(
        scene, SpectralIntegrator(max_depth=3, rr_depth=8), spp=512,
    ))
    center = img[6:10, 6:10]
    # depth-3 BSDF-only furnace sees a*L at the first hit plus the
    # emitter through the next bounces: same series as the RGB tracer
    rgb_ref = np.asarray(
        render(scene, PathIntegrator(max_depth=3, rr_depth=8), spp=256)
    )[6:10, 6:10]
    np.testing.assert_allclose(center.mean(), rgb_ref.mean(), rtol=0.03)
    # channels are balanced (gray stays gray through the CIE pipeline)
    chan = center.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(chan, chan.mean(), rtol=0.03)


def test_spectral_matches_rgb_on_cornell():
    """Colored walls: band-upsampled primaries are approximate, but channel
    statistics must track the RGB renderer."""
    scene, _ = load_dict(cornell_box(res=32, spp=1))
    img_s = np.asarray(render_spectral(
        scene, SpectralIntegrator(max_depth=4), spp=128,
    ))
    img_r = np.asarray(render(scene, PathIntegrator(max_depth=4), spp=128))
    ms, mr = img_s.reshape(-1, 3).mean(0), img_r.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(ms, mr, rtol=0.15)
    assert np.isfinite(img_s).all()


def test_spectral_conductor_cornell_matches_rgb():
    """Round-5 lobe broadening (VERDICT r4 #7): a GGX rough-conductor
    object in the cornell box renders spectrally (no strict gate) and its
    channel means track the RGB renderer — the conductor's Fresnel tint
    rides the same band upsampling as diffuse albedo."""
    sd = cornell_box(res=24, spp=1)
    # swap the white material (floor/boxes/ceiling) to GGX copper-ish
    sd["white"] = {"type": "roughconductor", "alpha": 0.25}
    scene, _ = load_dict(sd)
    img_s = np.asarray(render_spectral(
        scene, SpectralIntegrator(max_depth=4), spp=96,
    ))
    img_r = np.asarray(render(scene, PathIntegrator(max_depth=4), spp=96))
    assert np.isfinite(img_s).all()
    ms, mr = img_s.reshape(-1, 3).mean(0), img_r.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(ms, mr, rtol=0.2)


def test_spectral_smooth_conductor_furnace_runs():
    """The scene class that used to raise ValueError (strict gate) now
    renders: smooth conductor under the gray furnace keeps channel
    balance (gray Fresnel -> flat spectra -> gray image)."""
    sd = _furnace_scene()
    sd["object"]["bsdf"] = {"type": "conductor"}
    scene, _ = load_dict(sd)
    img = np.asarray(render_spectral(
        scene, SpectralIntegrator(max_depth=3, rr_depth=8), spp=128,
    ))
    assert np.isfinite(img).all() and img.mean() > 0
    chan = img[6:10, 6:10].reshape(-1, 3).mean(0)
    np.testing.assert_allclose(chan, chan.mean(), rtol=0.05)
