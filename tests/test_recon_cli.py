"""Recon CLI end-to-end on synthetic T2 / DWI h5 cases."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

ISMRMRD_HDR = """<?xml version="1.0"?>
<ismrmrdHeader xmlns="http://www.ismrm.org/ISMRMRD">
  <encoding>
    <encodedSpace><matrixSize><x>48</x><y>40</y><z>1</z></matrixSize></encodedSpace>
    <reconSpace><matrixSize><x>48</x><y>48</y><z>1</z></matrixSize></reconSpace>
    <encodingLimits><kspace_encoding_step_1>
      <minimum>0</minimum><maximum>39</maximum><center>20</center>
    </kspace_encoding_step_1></encodingLimits>
    <trajectoryDescription>
      <userParameterLong><name>rampUpTime</name><value>100</value></userParameterLong>
      <userParameterLong><name>rampDownTime</name><value>100</value></userParameterLong>
      <userParameterLong><name>flatTopTime</name><value>400</value></userParameterLong>
      <userParameterLong><name>acqDelayTime</name><value>10</value></userParameterLong>
      <userParameterLong><name>echoSpacing</name><value>1</value></userParameterLong>
    </trajectoryDescription>
  </encoding>
</ismrmrdHeader>"""


def _complex(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_recon_cli_t2_case(tmp_path, rng):
    import h5py
    from mri_acl_imagesegmentation_adsp_tpu.cli.recon import main
    case_dir = tmp_path / "training" / "T2"
    case_dir.mkdir(parents=True)
    # (avg=3, slices=1, coils=2, ro=48, pe=40), fully sampled (GRAPPA no-op)
    ksp = _complex(rng, (3, 1, 2, 48, 40))
    calib = _complex(rng, (1, 2, 48, 16))
    with h5py.File(case_dir / "case.h5", "w") as hf:
        hf.create_dataset("kspace", data=ksp)
        hf.create_dataset("calibration_data", data=calib)
        hf.create_dataset("ismrmrd_header", data=ISMRMRD_HDR.encode())
        hf.create_dataset("reconstruction_rss",
                          data=np.zeros((1, 48, 48), np.float32))
        hf.attrs["max"] = 1.0
        hf.attrs["norm"] = 1.0
        hf.attrs["patient_id"] = "p0"
        hf.attrs["acquisition"] = "T2"
    out = tmp_path / "recons"
    rc = main(["--data-path", str(tmp_path), "--output-path", str(out),
               "--sequence", "t2", "--split", "training"])
    assert rc == 0
    with h5py.File(out / "case.h5", "r") as hf:
        rec = hf["reconstruction_rss"][()]
    # pe padded 40 -> 48 (header padding (48-40)/2=4), square output
    assert rec.shape == (1, 48, 48)
    assert np.isfinite(rec).all() and rec.max() > 0


def test_recon_cli_dwi_case(tmp_path, rng):
    import h5py
    from mri_acl_imagesegmentation_adsp_tpu.cli.recon import main
    case_dir = tmp_path / "training" / "DIFFUSION"
    case_dir.mkdir(parents=True)
    n_avg, n_sl, n_coil, ro, pe = 51, 1, 2, 200, 104
    ksp = _complex(rng, (n_avg, n_sl, n_coil, ro, pe)) * 0.1
    calib = _complex(rng, (n_sl, n_coil, ro, pe)) * 0.1
    sens = _complex(rng, (n_sl, n_coil, ro, pe))
    with h5py.File(case_dir / "dcase.h5", "w") as hf:
        hf.create_dataset("kspace", data=ksp)
        hf.create_dataset("calibration_data", data=calib)
        hf.create_dataset("coil_sens_maps", data=sens)
        hf.create_dataset("ismrmrd_header", data=ISMRMRD_HDR.encode())
    out = tmp_path / "recons"
    rc = main(["--data-path", str(tmp_path), "--output-path", str(out),
               "--sequence", "dwi", "--split", "training"])
    assert rc == 0
    with h5py.File(out / "dcase.h5", "r") as hf:
        keys = set(hf.keys())
        b1500 = hf["b1500"][()]
    assert {"b50x", "b1000x", "trace_b50", "trace_b1000", "adc_map",
            "b1500"} <= keys
    assert b1500.shape == (1, 100, 100)
    assert np.isfinite(b1500).all()


def test_dwi_slice_chunking_matches_single_flush(rng):
    """The device-resident DWI pipeline flushes iFFT+combine in slice
    chunks to bound HBM transients; a forced 2-slice chunking must be
    bit-identical to the single-flush path (chunk-boundary alignment of
    the sensitivity maps and the output concatenation)."""
    from mri_acl_imagesegmentation_adsp_tpu.recon.dwi import (
        dwi_reconstruction)

    EPI = {"rampUpTime": 100.0, "rampDownTime": 100.0,
           "flatTopTime": 400.0, "acqDelayTime": 10.0, "echoSpacing": 1.0}
    n_avg, n_sl, n_coil, ro, pe = 51, 5, 2, 200, 24
    ksp = _complex(rng, (n_avg, n_sl, n_coil, ro, pe)) * 0.1
    mask = np.zeros(pe, bool)
    mask[::2] = True
    mask[pe // 2 - 4: pe // 2 + 4] = True
    ksp[..., ~mask] = 0
    calib = _complex(rng, (n_sl, n_coil, ro, pe)) * 0.1
    sens = _complex(rng, (n_sl, n_coil, ro, pe))

    slice_bytes = n_avg * n_coil * ro * pe * 2 * 4
    out_chunked = dwi_reconstruction(ksp, calib, sens, EPI,
                                     max_stage_bytes=2 * slice_bytes)
    out_single = dwi_reconstruction(ksp, calib, sens, EPI,
                                    max_stage_bytes=1e12)
    assert set(out_chunked) == set(out_single)
    for k in out_single:
        np.testing.assert_array_equal(out_chunked[k], out_single[k])

    # slice-sharded over a 2-way mesh (5 slices pad to 6 inside the
    # sharded GRAPPA hole-fill) == the single-device pipeline
    from mri_acl_imagesegmentation_adsp_tpu.parallel import make_mesh
    out_mesh = dwi_reconstruction(ksp, calib, sens, EPI,
                                  max_stage_bytes=1e12, mesh=make_mesh(2))
    for k in out_single:
        np.testing.assert_allclose(out_mesh[k], out_single[k],
                                   rtol=1e-5, atol=1e-5)

    # bf16 link transfer (halved bulk-upload bytes): only the hole-filled
    # DATA pre-rounds (~0.4% relative; calibration/sens/weight solves stay
    # f32) — every output map must stay inside a proportional envelope
    out_bf16 = dwi_reconstruction(ksp, calib, sens, EPI,
                                  max_stage_bytes=1e12,
                                  transfer_dtype="bfloat16")
    for k in out_single:
        scale = float(np.abs(out_single[k]).max()) + 1e-12
        rel = float(np.abs(out_bf16[k] - out_single[k]).max()) / scale
        assert rel < 3e-2, f"bf16-link DWI {k} max rel dev {rel:.2e}"
