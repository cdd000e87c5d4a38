"""End-to-end data-pipeline tests: adapters -> preprocess -> pack -> loader.

Pins the framework against a full NumPy transcription of the reference
pipeline (oracles.py) on synthetic fastMRI-style h5 volumes.
"""
import json
import os
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from oracles import (
    synthetic_kspace_volume, write_fake_fastmri_h5, np_preprocess_slice,
)

from mri_acl_imagesegmentation_adsp_tpu.data import (
    FastMRISinglecoilAdapter, MRIKneePreprocessor, TrainerDataset,
)
from mri_acl_imagesegmentation_adsp_tpu.data.packer import (
    build_preprocess, group_records_by_file, save_pack,
)
from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, KneeNPZ2DSlices, epoch_permutation, gather_batch,
)


@pytest.fixture
def fake_fastmri_root(tmp_path, rng):
    """3 synthetic single-coil volumes (8 slices of 64x48)."""
    root = tmp_path / "singlecoil"
    root.mkdir()
    vols = {}
    for i in range(3):
        ksp, imgs = synthetic_kspace_volume(rng, s=8, h=64, w=48)
        name = f"file{i:03d}.h5"
        write_fake_fastmri_h5(str(root / name), ksp, target=imgs)
        vols[str(root / name)] = ksp
    return root, vols


# ---------------------------------------------------------------------------
# Adapters
# ---------------------------------------------------------------------------

def test_adapter_discovery_and_record_contract(fake_fastmri_root):
    root, vols = fake_fastmri_root
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))
    records = adapter.discover_records()
    assert len(records) == 24  # 3 vols x 8 slices
    rec = adapter.load_record(records[0])
    assert set(rec) == {"image", "mask", "label", "kspace", "target", "meta"}
    assert rec["kspace"].shape == (64, 48)
    assert rec["target"].shape == (64, 48)
    assert rec["meta"]["target_key"] == "reconstruction_esc"
    assert rec["meta"]["slice_idx"] == 0


def test_adapter_bulk_volume_matches_per_slice(fake_fastmri_root):
    root, vols = fake_fastmri_root
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))
    fp = sorted(vols)[0]
    vol = adapter.load_volume(fp)
    assert vol["kspace_pair"].shape == (8, 64, 48, 2)
    ksp = vols[fp]
    np.testing.assert_allclose(vol["kspace_pair"][..., 0], ksp.real, atol=1e-6)
    np.testing.assert_allclose(vol["kspace_pair"][..., 1], ksp.imag, atol=1e-6)


def test_trainer_dataset_meta_merging(fake_fastmri_root):
    root, _ = fake_fastmri_root
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))
    ds = TrainerDataset(adapter)
    assert len(ds) == 24
    s = ds[5]
    # the adapter stamps its own tag (reference fastmri_adapter.py:51)
    assert s["meta"]["adapter"] == "fastmri_singlecoil-h5"
    assert s["meta"]["index"] == 5
    assert s["image"].shape == (64, 48)  # falls back to target

    ds_pre = TrainerDataset(adapter, preprocessor=MRIKneePreprocessor(
        out_size=(32, 32)))
    s = ds_pre[0]
    assert s["image"].shape == (32, 32)
    assert s["mask"].shape == (32, 32)
    # records carry reconstruction_esc, which outranks kspace (priority
    # image -> target -> kspace, mri_preprocess.py:267-296)
    assert s["source"] == "target"


# ---------------------------------------------------------------------------
# Preprocess parity vs reference oracle
# ---------------------------------------------------------------------------

def test_preprocess_record_matches_reference_chain(fake_fastmri_root, rng):
    root, vols = fake_fastmri_root
    ksp = next(iter(vols.values()))[0]  # one slice
    pre = MRIKneePreprocessor(out_size=(80, 80))
    # kspace-only record: priority must select kspace path
    out = pre.preprocess_record({"kspace": ksp, "meta": {"slice_idx": 0}})
    assert out["source"] == "kspace"
    img_z, img_01, mk = np_preprocess_slice(ksp, out_size=(80, 80))
    assert (out["mask"] != mk).mean() < 0.005
    np.testing.assert_allclose(out["img_z"], img_z, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(out["img_01"], img_01, rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_adapter_demo_cli_end_to_end(fake_fastmri_root, tmp_path, capsys):
    """cli.main (C22): preview the adapter records, then chain into the
    preprocess driver when preprocess flags follow (reference src/main.py
    flow) — artifacts land on disk."""
    from mri_acl_imagesegmentation_adsp_tpu.cli.main import main

    root, vols = fake_fastmri_root
    out_dir = tmp_path / "artifacts"
    main(["--dataset", "fastmri", "--root", str(root),
          "--root_dir", str(root), "--out_dir", str(out_dir),
          "--height", "48", "--width", "48", "--slice_keep", "0.0,1.0"])
    printed = capsys.readouterr().out
    assert "Dataset size: 24" in printed          # 3 vols x 8 slices
    assert "Preprocess finished for 3 volume(s)" in printed
    for i in range(3):
        assert (out_dir / f"file{i:03d}" / "volume.npz").exists()

    # preview-only mode: no preprocess flags -> no artifacts
    main(["--dataset", "fastmri", "--root", str(root)])
    assert "Dataset size: 24" in capsys.readouterr().out


def test_knee_pck_adapter_layouts(tmp_path, rng):
    """C5: both vendored pickle layouts (dict-of-arrays and list-of-tuples)
    plus the array-like-fallback heuristic, discovery across nested dirs,
    and the unsupported-root error path."""
    import pickle
    from mri_acl_imagesegmentation_adsp_tpu.data.adapters import (
        KneePckAdapter)

    imgs = rng.integers(0, 255, (4, 20, 20)).astype(np.uint8)
    labels = [0, 1, 2, 1]
    (tmp_path / "sub").mkdir()
    with open(tmp_path / "dictstyle.pck", "wb") as f:
        pickle.dump({"data": imgs, "labels": labels}, f)
    with open(tmp_path / "sub" / "liststyle.pickle", "wb") as f:
        pickle.dump([(imgs[i], labels[i]) for i in range(2)], f)
    with open(tmp_path / "fallback.pck", "wb") as f:  # no known keys
        pickle.dump({"weird_name": imgs[:3]}, f)

    ad = KneePckAdapter()
    recs = ad.discover_records(str(tmp_path))
    assert len(recs) == 4 + 2 + 3  # all three files, nested glob included

    by_file = {}
    for r in recs:
        by_file.setdefault(Path(r["pck_path"]).name, []).append(r)
    r = ad.load_record(by_file["dictstyle.pck"][2])
    np.testing.assert_array_equal(r["image"], imgs[2])
    assert r["label"] == 2 and r["meta"]["dataset"] == "kaggle-knee"
    r = ad.load_record(by_file["liststyle.pickle"][1])
    np.testing.assert_array_equal(r["image"], imgs[1])
    assert r["label"] == 1
    r = ad.load_record(by_file["fallback.pck"][0])
    np.testing.assert_array_equal(r["image"], imgs[0])
    assert r["label"] is None

    with open(tmp_path / "bad.pck", "wb") as f:
        pickle.dump(42, f)
    with pytest.raises(ValueError, match="Unsupported pickle root"):
        ad.discover_records(str(tmp_path))


def test_preprocess_input_priority(rng):
    pre = MRIKneePreprocessor(out_size=(32, 32))
    img = np.abs(rng.standard_normal((40, 40))).astype(np.float32)
    ksp = (rng.standard_normal((40, 40)) + 1j * rng.standard_normal((40, 40))
           ).astype(np.complex64)
    out = pre.preprocess_record({"image": img, "kspace": ksp, "meta": {}})
    assert out["source"] == "image"
    out = pre.preprocess_record({"target": img, "kspace": ksp, "meta": {}})
    assert out["source"] == "target"
    out = pre.preprocess_record({"kspace": ksp, "meta": {}})
    assert out["source"] == "kspace"
    with pytest.raises(ValueError):
        pre.preprocess_record({"meta": {}})
    with pytest.raises(ValueError):
        # (2,H,W) real/imag split is rejected like the reference
        pre.preprocess_record({"kspace": np.zeros((2, 8, 8), np.float32)})


def test_preprocess_records_keep_band():
    pre = MRIKneePreprocessor(out_size=(16, 16), slice_keep=(0.3, 0.7))
    recs = [{"image": np.full((24, 24), i, np.float32) + np.eye(24, dtype=np.float32),
             "meta": {"slice_idx": i}} for i in range(10)]
    pack = pre.preprocess_records(recs)
    # reference arithmetic: s0 = int(10*.3) = 3, s1 = int(10*.7) = 7
    assert pack["indices"] == [3, 4, 5, 6]
    assert pack["tensor"].shape == (4, 1, 16, 16)
    assert pack["mask"].shape == (4, 16, 16)


def test_volume_chain_equals_slice_chain(fake_fastmri_root):
    root, vols = fake_fastmri_root
    ksp = next(iter(vols.values()))
    pre = MRIKneePreprocessor(out_size=(48, 48), slice_keep=(0.0, 1.0))
    recs = [{"kspace": ksp[s], "meta": {"slice_idx": s}}
            for s in range(ksp.shape[0])]
    pack = pre.preprocess_records(recs)          # vmapped fast path
    one = pre.preprocess_record(recs[3])         # per-slice path
    np.testing.assert_allclose(pack["tensor"][3, 0], one["img_z"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(pack["mask"][3], one["mask"])


def test_bf16_link_transfer_close_to_f32(fake_fastmri_root):
    """transfer_dtype="bfloat16" halves corpus upload bytes at a bounded
    accuracy cost: the chain's DFT runs at Precision.HIGHEST (full-f32
    operands), so the bf16 pre-round's ~0.4% relative input error
    propagates on every backend — including the TPU (measured 1.7e-2 max
    z-tensor dev on the v5e; the same tolerance is gated on-chip in
    scripts/verify_tpu.py 1b)."""
    root, vols = fake_fastmri_root
    pre = MRIKneePreprocessor(out_size=(48, 48), slice_keep=(0.0, 1.0))
    pairs = [np.stack([k.real, k.imag], -1).astype(np.float32)
             for k in vols.values()]
    ref = pre.preprocess_volumes_pairs(pairs)
    lo = pre.preprocess_volumes_pairs(pairs, transfer_dtype="bfloat16")
    for r, l in zip(ref, lo):
        # z-scored tensors: unit-scale, so atol is the meaningful bound
        # (measured max CPU deviation 0.063 on the fixtures — pure input
        # rounding, since CPU matmuls keep f32 operands)
        np.testing.assert_allclose(r["tensor"], l["tensor"], atol=0.12)
        agree = (r["mask"] == l["mask"]).mean()
        assert agree > 0.995, f"mask agreement {agree}"
    with pytest.raises(ValueError):
        pre.preprocess_volumes_pairs(pairs, transfer_dtype="float16")


@pytest.mark.slow  # r5 fast-gate re-tier (VERDICT r4 #6): heavy compile; a cheaper fast pin or the dryrun covers this path
def test_corpus_preprocess_round_robin_devices(fake_fastmri_root):
    """devices=: volumes round-robin across chips; results are
    placement-invariant (bit-equal to the default-device path)."""
    import jax
    root, vols = fake_fastmri_root
    pre = MRIKneePreprocessor(out_size=(48, 48), slice_keep=(0.0, 1.0))
    pairs = [np.stack([k.real, k.imag], -1).astype(np.float32)
             for k in vols.values()]
    ref = pre.preprocess_volumes_pairs(pairs)
    rr = pre.preprocess_volumes_pairs(pairs, devices=jax.devices()[:4])
    for r, l in zip(ref, rr):
        np.testing.assert_array_equal(r["tensor"], l["tensor"])
        np.testing.assert_array_equal(r["mask"], l["mask"])


# ---------------------------------------------------------------------------
# Packer / artifact layout
# ---------------------------------------------------------------------------

def test_build_preprocess_prefers_target_over_kspace(fake_fastmri_root,
                                                     tmp_path, rng):
    """Record priority image -> target -> kspace also governs the bulk
    fast path (the reference preprocesses reconstruction_* when present,
    mri_preprocess.py:267-296) — regression test for the k-space shortcut."""
    root, vols = fake_fastmri_root
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))
    args = SimpleNamespace(root_dir=str(root), out_dir=str(tmp_path / "a"),
                           height=32, width=32, slice_keep="0.3,0.7",
                           clip="1.0,99.5", use_n4=False, use_denoise=False,
                           preview_max=0)
    summary = build_preprocess(args, adapter)
    vol_dir = Path(summary[0]["output_dir"])
    metas = json.loads((vol_dir / "metas.json").read_text())
    assert metas[0]["target_key"] == "reconstruction_esc"
    with np.load(vol_dir / "volume.npz") as z:
        got = z["img"][0, 0]

    # oracle: per-record path on the same slice (source must be target)
    pre = MRIKneePreprocessor(out_size=(32, 32), slice_keep=(0.3, 0.7))
    fp = summary[0]["filepath"]
    rec = adapter.load_record({"filepath": fp, "slice_idx": 2})  # band [2,5)
    out = pre.preprocess_record(rec)
    assert out["source"] == "target"
    np.testing.assert_allclose(got, out["img_z"], rtol=1e-4, atol=1e-4)


def test_build_preprocess_artifact_layout(fake_fastmri_root, tmp_path):
    root, vols = fake_fastmri_root
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))
    out = tmp_path / "artifacts"
    args = SimpleNamespace(root_dir=str(root), out_dir=str(out), height=32,
                           width=32, slice_keep="0.3,0.7", clip="1.0,99.5",
                           use_n4=False, use_denoise=False, preview_max=2)
    summary = build_preprocess(args, adapter)
    assert len(summary) == 3
    vol_dir = Path(summary[0]["output_dir"])
    for name in ["volume.npz", "tensor.pt", "mask.npy", "indices.json",
                 "metas.json", "stats.json"]:
        assert (vol_dir / name).exists(), name
    assert len(list((vol_dir / "preview").glob("*.png"))) == 2
    with np.load(vol_dir / "volume.npz") as z:
        assert z["img"].shape == (3, 1, 32, 32)   # keep band of 8 -> [2,5) wait
        assert z["img"].dtype == np.float32
        assert z["msk"].dtype == np.uint8
    stats = json.loads((vol_dir / "stats.json").read_text())
    # z-score QC: in-mask mean ~0, std ~1
    assert abs(stats["mean_in_mask_mean"]) < 1e-3
    assert abs(stats["mean_in_mask_std"] - 1.0) < 1e-2


# ---------------------------------------------------------------------------
# SliceStore / loader semantics
# ---------------------------------------------------------------------------

def _make_packs(tmp_path, rng, n_vols=3, s=5, h=24, w=24):
    files = []
    for v in range(n_vols):
        img = rng.standard_normal((s, 1, h, w)).astype(np.float32)
        msk = (rng.random((s, h, w)) > 0.5).astype(np.uint8)
        d = tmp_path / f"vol{v}"
        d.mkdir()
        np.savez_compressed(d / "volume.npz", img=img, msk=msk)
        files.append(str(d / "volume.npz"))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(files))
    return lst, files


def test_slice_store_neighbor_table_matches_reference_25d(tmp_path, rng):
    lst, files = _make_packs(tmp_path, rng)
    store = SliceStore.from_list(str(lst))
    assert len(store) == 15
    nbr = store.neighbor_table(3)
    ds = KneeNPZ2DSlices(str(lst), k=3, aug="none")
    # reference 2.5-D stacking must equal the gather through the table
    for i in [0, 4, 5, 7, 14]:
        x_ref, _ = ds[i]
        x_store = store.images[nbr[i]]
        np.testing.assert_array_equal(x_store, x_ref)


def test_gather_batch_and_epoch_permutation(tmp_path, rng):
    import jax
    lst, _ = _make_packs(tmp_path, rng)
    store = SliceStore.from_list(str(lst)).to_device(k=3)
    perm = epoch_permutation(jax.random.PRNGKey(0), 15, 4, drop_last=True)
    assert perm.shape == (3, 4)
    assert len(np.unique(np.asarray(perm))) == 12
    x, y = gather_batch(store.images, store.masks, store.neighbors, perm[0])
    assert x.shape == (4, 24, 24, 3)
    assert y.shape == (4, 24, 24)


def test_knee_npz_dataset_formats(tmp_path, rng):
    lst, _ = _make_packs(tmp_path, rng)
    ds = KneeNPZ2DSlices(str(lst), k=1, aug="none")
    x, y = ds[0]
    assert x.shape == (1, 24, 24) and y.shape == (1, 24, 24)
    assert y.dtype == np.float32
    ds3 = KneeNPZ2DSlices(str(lst), k=1, imagenet_norm=True)
    x, _ = ds3[0]
    assert x.shape == (3, 24, 24)
    with pytest.raises(AssertionError):
        KneeNPZ2DSlices(str(lst), k=2)


def test_build_preprocess_skip_existing(tmp_path, rng):
    """--skip-existing: complete packs (stats.json is written last) are not
    redone; a pack missing its completeness marker IS redone; output
    artifacts match a from-scratch run."""
    import os
    from types import SimpleNamespace

    from oracles import synthetic_kspace_volume, write_fake_fastmri_h5
    from mri_acl_imagesegmentation_adsp_tpu.data.adapters import (
        FastMRISinglecoilAdapter)

    root = tmp_path / "raw"
    root.mkdir()
    for i in range(3):
        ksp, _ = synthetic_kspace_volume(rng, s=4, h=48, w=48)
        write_fake_fastmri_h5(str(root / f"v{i}.h5"), ksp)
    art = tmp_path / "art"
    spec = dict(root_dir=str(root), out_dir=str(art), height=48, width=48,
                slice_keep="0.0,1.0", clip="1.0,99.5", use_n4=False,
                use_denoise=False, preview_max=1)
    adapter = FastMRISinglecoilAdapter(root_dir=str(root))

    s1 = build_preprocess(SimpleNamespace(**spec), adapter)
    assert len(s1) == 3 and not any(e.get("skipped_existing") for e in s1)
    mtimes = {e["npz_path"]: os.path.getmtime(e["npz_path"]) for e in s1}

    # second run with skip_existing: nothing redone
    s2 = build_preprocess(SimpleNamespace(**spec, skip_existing=True),
                          adapter)
    assert len(s2) == 3 and all(e.get("skipped_existing") for e in s2)
    assert all(e["num_slices"] == 4 for e in s2)
    for e in s2:
        assert os.path.getmtime(e["npz_path"]) == mtimes[e["npz_path"]]

    # simulate a crash mid-write of v1: stats.json (written LAST) missing
    os.remove(os.path.join(os.path.dirname(s1[1]["npz_path"]), "stats.json"))
    s3 = build_preprocess(SimpleNamespace(**spec, skip_existing=True),
                          adapter)
    redone = [e for e in s3 if not e.get("skipped_existing")]
    assert len(redone) == 1 and "v1" in redone[0]["output_dir"]
    assert os.path.isfile(os.path.join(
        os.path.dirname(redone[0]["npz_path"]), "stats.json"))
