import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodalvc_tpu.runtime.pt_loader import flatten_state_dict, load_pt


def test_load_pt_roundtrip(tmp_path, rng):
    state = {
        "model": {
            "w": torch.from_numpy(rng.standard_normal((4, 3)).astype(np.float32)),
            "b": torch.arange(5, dtype=torch.int64),
            "h": torch.from_numpy(rng.standard_normal(7).astype(np.float16)),
        },
        "step": 123,
        "nested": {"scale": torch.tensor(2.5)},
    }
    p = tmp_path / "ckpt.pt"
    torch.save(state, p)
    loaded = load_pt(str(p))
    np.testing.assert_array_equal(loaded["model"]["w"], state["model"]["w"].numpy())
    np.testing.assert_array_equal(loaded["model"]["b"], state["model"]["b"].numpy())
    np.testing.assert_array_equal(loaded["model"]["h"], state["model"]["h"].numpy())
    assert loaded["step"] == 123
    assert float(loaded["nested"]["scale"]) == 2.5


def test_load_pt_shared_and_strided(tmp_path):
    base = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    view = base.t()  # non-contiguous view sharing storage
    torch.save({"a": base, "b": view}, tmp_path / "c.pt")
    loaded = load_pt(str(tmp_path / "c.pt"))
    np.testing.assert_array_equal(loaded["a"], base.numpy())
    np.testing.assert_array_equal(loaded["b"], view.numpy())


def test_load_pt_bf16(tmp_path):
    x = torch.linspace(-2, 2, 16, dtype=torch.bfloat16)
    torch.save({"x": x}, tmp_path / "b.pt")
    loaded = load_pt(str(tmp_path / "b.pt"))
    np.testing.assert_allclose(loaded["x"], x.float().numpy(), rtol=1e-2)


def test_load_pt_skips_unknown_objects(tmp_path):
    from argparse import Namespace

    torch.save({"cfg": Namespace(lr=0.1), "w": torch.ones(2)}, tmp_path / "n.pt")
    loaded = load_pt(str(tmp_path / "n.pt"))
    np.testing.assert_array_equal(loaded["w"], np.ones(2, dtype=np.float32))
    flat = flatten_state_dict(loaded)
    assert "w" in flat and not any(k.startswith("cfg") for k in flat)
