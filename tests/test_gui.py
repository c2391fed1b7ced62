"""GUI tests.

The settings/slider/batch-planning logic is pure and always tested; widget
construction tests run only when a display server is reachable (they are
skipped headlessly, like any Tk suite).
"""

import numpy as np
import pytest

from aejpeg_tpu.gui.control_panel import PanelState
from aejpeg_tpu.gui.range_slider import RangeModel
from aejpeg_tpu.gui.app import plan_batches
from aejpeg_tpu.io.image import ImageData


# ---------------------------------------------------------------- RangeModel

def test_range_model_initial_clamp_and_order():
    m = RangeModel(1, 99, init_lo=120, init_hi=-5, track_px=280)
    assert m.values == (1, 99)
    m = RangeModel(1, 8, init_lo=6, init_hi=2, track_px=100)
    assert m.values == (2, 6)


def test_range_model_mapping_roundtrip():
    m = RangeModel(1, 99, 20, 60, track_px=280)
    for v in range(1, 100):
        assert m.px_to_value(m.value_to_px(v)) == v


def test_range_model_drag_no_cross():
    m = RangeModel(0, 100, 20, 60, track_px=200)
    assert m.grab(m.value_to_px(21)) == "low"
    m.drag(m.value_to_px(80))            # try to drag low past high
    assert m.values == (60, 60)          # clamped at high
    m.release()
    assert m.grab(m.value_to_px(61)) == "high"
    m.drag(m.value_to_px(90))
    assert m.values == (60, 90)


def test_range_model_coincident_grab_direction():
    m = RangeModel(0, 100, 50, 50, track_px=200)
    assert m.grab(m.value_to_px(30)) == "low"
    m.release()
    m2 = RangeModel(0, 100, 50, 50, track_px=200)
    assert m2.grab(m2.value_to_px(70)) == "high"


def test_range_model_drag_clamps_to_track():
    m = RangeModel(1, 8, 2, 6, track_px=100)
    m.grab(m.value_to_px(2))
    m.drag(-500.0)
    assert m.values[0] == 1
    m.release()
    m.grab(m.value_to_px(6))
    m.drag(1e6)
    assert m.values[1] == 8


# ---------------------------------------------------------------- PanelState

def test_panel_state_block_exponents_to_sizes():
    st = PanelState(color_space="ICtCp", quality=(20, 80),
                    block_exponents=(2, 6))
    assert st.block_sizes == (4, 64)
    cfg = st.to_config()
    assert cfg.color_space == "ICtCp"
    assert cfg.quality_range == (20, 80)
    assert tuple(cfg.block_size_range) == (4, 64)


def test_panel_state_file_partition():
    st = PanelState(files=["a.png", "b.AJPG", "c.tiff", "d.ajpg"])
    assert st.image_files() == ["a.png", "c.tiff"]
    assert st.ajpg_files() == ["b.AJPG", "d.ajpg"]


# ------------------------------------------------------------- batch planner

def test_plan_batches_groups_by_shape(tmp_path):
    import imageio.v3 as iio
    rng = np.random.default_rng(0)
    paths = []
    for i, shape in enumerate([(16, 24), (16, 24), (32, 8)]):
        p = tmp_path / f"img{i}.png"
        iio.imwrite(p, rng.integers(0, 255, (*shape, 3), dtype=np.uint8))
        paths.append(str(p))
    groups = plan_batches(paths)
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 2]
    for g in groups:
        shapes = {img.original_shape[:2] for _, img in g}
        assert len(shapes) == 1


def test_process_preview_logic_headless():
    """The preview pipeline (compress -> decompress -> ratio) must work
    without a display: exercised via the unbound method with a stub."""
    import cv2 as cv
    from aejpeg_tpu.codec.pipeline import Codec
    from aejpeg_tpu.gui.app import AejpegApp

    rng = np.random.default_rng(2)
    small = rng.random((8, 8, 3), np.float32)
    arr = np.clip(cv.resize(small, (64, 64),
                            interpolation=cv.INTER_CUBIC), 0, 1)
    img = ImageData.from_array(arr.astype(np.float32), extension=".png")

    class Stub:
        codec = Codec(PanelState().to_config())

    out, ratio = AejpegApp._process_preview(Stub(), img)
    assert out.data.shape == img.data.shape
    assert ratio > 1.0


# ------------------------------------------------------------- widget layer

def _display_available():
    import tkinter as tk
    try:
        root = tk.Tk()
        root.destroy()
        return True
    except Exception:
        return False


needs_display = pytest.mark.skipif(not _display_available(),
                                   reason="no display server")


@needs_display
def test_app_constructs_and_settings_propagate(tmp_path):
    import tkinter as tk
    from aejpeg_tpu.gui import AejpegApp

    root = tk.Tk()
    try:
        app = AejpegApp(root, preview_path=None)
        app.control_panel.quality_slider.set_values(30, 70)
        app.control_panel._committed()
        assert app.codec.config.quality_range == (30, 70)
        app.control_panel.block_slider.set_values(3, 5)
        app.control_panel._committed()
        assert tuple(app.codec.config.block_size_range) == (8, 32)
    finally:
        root.destroy()
