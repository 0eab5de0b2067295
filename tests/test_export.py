"""Portable StableHLO export artifacts (core/export.py + CLI).

The exported module must (a) round-trip through serialize/deserialize,
(b) accept ANY batch size when exported with the symbolic batch dim,
(c) match the live model bit-for-bit semantics (same XLA program modulo
compiler version), and (d) refuse malformed artifacts."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.core.export import (export_transfer, save_artifact,
                                          load_artifact, load_manifest)
from weather_unet_tpu.models import ConditionalUNet


@pytest.fixture(scope="module")
def tiny_model():
    m = ConditionalUNet(num_classes=3, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    c1 = jnp.asarray(np.eye(3, dtype=np.float32)[:1])
    v = m.init(jax.random.key(0), x1, c1)
    return m, v


def test_export_symbolic_batch_roundtrip(tiny_model, tmp_path, rng):
    m, v = tiny_model
    art_dir = str(tmp_path / "art")
    save_artifact(art_dir, export_transfer(m, v, size=32),
                  extra={"input_size": 32})
    art = load_artifact(art_dir)

    for b in (2, 5):  # one artifact, two batch sizes — no re-export
        x = jnp.asarray(rng.standard_normal((b, 32, 32, 3)).astype(np.float32))
        c = jnp.asarray(np.eye(3, dtype=np.float32)[
            rng.integers(0, 3, b)])
        np.testing.assert_allclose(np.asarray(art["translate"](x, c)),
                                   np.asarray(m.apply(v, x, c)),
                                   atol=1e-5)

    u8 = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    c2 = jnp.eye(3, dtype=jnp.float32)[:2]
    got = np.asarray(art["translate_u8"](jnp.asarray(u8), c2))
    x = (jnp.asarray(u8).astype(jnp.float32) / 255.0 - 0.5) / 0.5
    want = np.asarray(((m.apply(v, x, c2) + 1.0) * 127.5
                       ).clip(0, 255).astype(jnp.uint8))
    np.testing.assert_array_equal(got, want)


def test_export_manifest_and_validation(tiny_model, tmp_path):
    m, v = tiny_model
    art_dir = str(tmp_path / "art")
    save_artifact(art_dir, export_transfer(m, v, size=32, batch=4))
    man = load_manifest(art_dir)
    assert man["format"].startswith("weather_unet_tpu.export/")
    assert set(man["modules"]) == {"translate", "translate_u8"}
    # batch mode + geometry recorded EXPLICITLY from the real avals (ADVICE
    # r3: consumers must not string-parse aval reprs)
    meta = man["modules"]["translate"]
    assert meta["batch"] == 4
    assert meta["input_size"] == 32 and meta["num_classes"] == 3

    # a directory with a wrong-format manifest is refused, not guessed at
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "manifest.json").write_text(json.dumps({"format": "other/1"}))
    with pytest.raises(ValueError, match="not a weather_unet_tpu export"):
        load_artifact(str(bad))


def test_exported_transfer_refuses_pinned_batch(tiny_model, tmp_path):
    """ExportedTransfer needs the symbolic-batch artifact for bucketing; a
    --batch artifact must refuse up front with the documented ValueError
    (ADVICE r3: path was untested)."""
    from weather_unet_tpu.core.export import ExportedTransfer

    m, v = tiny_model
    art_dir = str(tmp_path / "pinned")
    save_artifact(art_dir, export_transfer(m, v, size=32, batch=4))
    with pytest.raises(ValueError, match="pinned batch"):
        ExportedTransfer(art_dir)

    # LEGACY pinned artifact: manifest predates the "batch" field. The
    # refusal must fall back to the recorded aval reprs, not default the
    # missing key to symbolic and die per-request instead.
    import os

    man = load_manifest(art_dir)
    for mod in man["modules"].values():
        mod.pop("batch")
        assert mod["in_avals"][0].split("[", 1)[1].startswith("4,")
    with open(os.path.join(art_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="pinned batch"):
        ExportedTransfer(art_dir)


def test_exported_transfer_geometry_from_module_record(tiny_model, tmp_path):
    """Artifacts saved WITHOUT extra= still serve: geometry comes from the
    per-module record, not optional top-level extras (ADVICE r3)."""
    from weather_unet_tpu.core.export import ExportedTransfer

    m, v = tiny_model
    art_dir = str(tmp_path / "noextra")
    save_artifact(art_dir, export_transfer(m, v, size=32))   # no extra=
    et = ExportedTransfer(art_dir)
    assert (et.input_size, et.num_classes) == (32, 3)

    # legacy artifact with NEITHER module geometry nor extras: clear refusal
    man = load_manifest(art_dir)
    for mod in man["modules"].values():
        for k in ("batch", "input_size", "num_classes"):
            mod.pop(k, None)
    import os
    with open(os.path.join(art_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="no input_size/num_classes"):
        ExportedTransfer(art_dir)


def test_save_artifact_rejects_reserved_extra_keys(tiny_model, tmp_path):
    m, v = tiny_model
    exports = export_transfer(m, v, size=32)
    with pytest.raises(ValueError, match="reserved"):
        save_artifact(str(tmp_path / "x"), exports,
                      extra={"modules": {}, "note": "boom"})


def test_load_artifact_platform_preflight(tiny_model, tmp_path):
    """A platform-mismatched artifact is refused at load with a clear error
    naming both sides, instead of an opaque lowering failure (ADVICE r3)."""
    m, v = tiny_model
    art_dir = str(tmp_path / "plat")
    save_artifact(art_dir, export_transfer(m, v, size=32))
    man = load_manifest(art_dir)
    for mod in man["modules"].values():
        mod["platforms"] = ["tpu"]          # tests run on forced-CPU jax
    import os
    with open(os.path.join(art_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="exported for platforms"):
        load_artifact(art_dir)


def test_export_cli_check(tmp_path, rng, capsys):
    """wut-export-serving end to end: checkpoint -> artifact -> --check."""
    from weather_unet_tpu.cli.export_serving import main
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    cp = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)
    out = str(tmp_path / "art")
    main(["--cp_path", cp, "--out", out, "--input_size", "32",
          "--dtype", "f32", "--check"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["checked"] and res["batch"] == "symbolic"
    assert set(res["modules"]) == {"translate", "translate_u8"}
