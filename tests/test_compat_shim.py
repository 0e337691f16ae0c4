"""Reference-import compatibility (README.md:106-143 usage examples)."""


def test_reference_imports_work():
    from RobustART.noise import AddNoise, noise_list
    from RobustART.model import get_model
    from RobustART.metrics import ImageNetAEvaluator, ImageNetCEvaluator
    from RobustART.train import cls_solver

    assert noise_list[0] == "imagenet-s"
    assert callable(get_model)
    assert ImageNetCEvaluator is not None and ImageNetAEvaluator is not None
    assert cls_solver is not None


def test_readme_noise_example():
    import numpy as np

    from RobustART.noise import AddNoise

    noise = AddNoise("imagenet-c")
    noise.set_config(severity=2, corruption_name="contrast")
    img = np.full((32, 32, 3), 128, np.uint8)
    out = noise.add_noise(img, seed=0)
    assert out.shape == (32, 32, 3)
