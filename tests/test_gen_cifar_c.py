"""End-to-end: generate CIFAR-10-C/P with our kernels, evaluate with the CLIs."""

import numpy as np

from robustart_tpu.cifar10.gen_cifar_c import main as gen_main


def test_generate_and_evaluate_c_p(tmp_path):
    out_c = tmp_path / "C"
    out_p = tmp_path / "P"
    gen_main([
        "--dataset", "fake", "--limit", "8",
        "--out_c", str(out_c), "--out_p", str(out_p),
        "--corruptions", "gaussian_noise", "jpeg_compression",
        "--perturbations", "gaussian_noise",
        "--n_frames", "3",
    ])
    labels = np.load(out_c / "labels.npy")
    assert len(labels) == 40  # 5 severities x 8
    gn = np.load(out_c / "gaussian_noise.npy")
    assert gn.shape == (40, 32, 32, 3) and gn.dtype == np.uint8
    # severity slices ordered 1..5: noise magnitude grows
    base = gn[:8].astype(int)
    assert np.abs(np.diff([gn[i * 8:(i + 1) * 8].astype(int).std()
                           for i in range(5)])).sum() > 0

    vids = np.load(out_p / "gaussian_noise.npy")
    assert vids.shape == (8, 3, 32, 32, 3)

    # evaluate the generated C set with the reference-style CLI
    from robustart_tpu.cifar10.test_cifar_c import main as eval_main

    summary = eval_main([
        "--model", "ResNet18", "--dataset", "fake",
        "--data_dir", str(out_c), "--batch_size", "8",
    ])
    assert set(summary["results"]) == {"gaussian_noise", "jpeg_compression"}
    assert 0.0 <= summary["mCE"] <= 1.0
