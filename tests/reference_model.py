"""Reference-spec oracle codec for parity testing.

An independent numpy+cv2 implementation of the documented reference
semantics (SURVEY.md section 2.2), used ONLY as a test oracle: float64 color
math (Numba promotes to f64 in the reference), cv2 for resize/DCT/edges,
recursive quadtree, zlib-9 container.  It exists so the TPU codec's output
can be compared against reference behavior without the reference's
dependencies (numba is unavailable here).

Structure citations refer to /root/reference/src/jpeg/jpeg.py.
"""

import json
import zlib
from io import BytesIO

import cv2 as cv
import numpy as np

from aejpeg_tpu.color import constants as C
from aejpeg_tpu.config import COLOR_SPACE_SETTINGS, LUMA_QUANT, CHROMA_QUANT
from aejpeg_tpu.utils import quality_factor, root_size_for
from aejpeg_tpu.ops.zigzag import zigzag_indices


# ------------------------------------------------------------ color (f64)
def _srgb_to_linear(v):
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(v):
    s = np.where(v <= 0.0031308, v * 12.92,
                 1.055 * np.maximum(v, 0.0031308) ** (1 / 2.4) - 0.055)
    return np.clip(s, 0, 1)


def _pq_inv(y, m2=C.PQ_M2):
    t = np.maximum(y / C.PQ_LP, 0) ** C.PQ_M1
    return ((C.PQ_C1 + C.PQ_C2 * t) / (1 + C.PQ_C3 * t)) ** m2


def _pq(e, m2=C.PQ_M2):
    t = np.maximum(e, 0) ** (1 / m2)
    num = np.maximum(t - C.PQ_C1, 0)
    den = np.maximum(C.PQ_C2 - C.PQ_C3 * t, 1e-12)
    return C.PQ_LP * (num / den) ** (1 / C.PQ_M1)


def _f64(m):
    return np.asarray(m, np.float64)


def convert(space, rgb, inverse=False):
    x = rgb.astype(np.float64)
    if space == "YCbCr":
        m = _f64(C.M_YCBCR_TO_SRGB) if inverse else _f64(C.M_SRGB_TO_YCBCR)
        out = x @ m.T
        return np.clip(out, 0, 1) if inverse else out
    if space == "YCoCg":
        m = _f64(C.M_YCOCG_TO_SRGB) if inverse else _f64(C.M_SRGB_TO_YCOCG)
        out = x @ m.T
        return np.clip(out, 0, 1) if inverse else out
    if space == "YCoCg-R":
        m = (_f64(C.M_YCOCG_R_TO_SRGB) if inverse
             else _f64(C.M_SRGB_TO_YCOCG_R))
        out = x @ m.T
        return np.clip(out, 0, 1) if inverse else out
    if space == "OKLAB":
        if not inverse:
            xyz = _srgb_to_linear(x) @ _f64(C.M_LINEAR_RGB_TO_XYZ).T
            lms = xyz @ _f64(C.OKLAB_M_XYZ_TO_LMS).T
            return np.cbrt(lms) @ _f64(C.OKLAB_M_LMSP_TO_LAB).T
        lms = (x @ _f64(C.OKLAB_M_LAB_TO_LMSP).T) ** 3
        xyz = lms @ _f64(C.OKLAB_M_LMS_TO_XYZ).T
        return _linear_to_srgb(xyz @ _f64(C.M_XYZ_TO_LINEAR_RGB).T)
    if space == "ICtCp":
        if not inverse:
            xyz = _srgb_to_linear(x) @ _f64(C.M_LINEAR_RGB_TO_XYZ).T
            lms = xyz @ _f64(C.ICTCP_M_XYZ_TO_LMS).T
            return _pq_inv(lms) @ _f64(C.ICTCP_M_LMSP_TO_ICTCP).T
        lms = _pq(x @ _f64(C.ICTCP_M_ICTCP_TO_LMSP).T)
        xyz = lms @ _f64(C.ICTCP_M_LMS_TO_XYZ).T
        return _linear_to_srgb(xyz @ _f64(C.M_XYZ_TO_LINEAR_RGB).T)
    if space == "ICaCb":
        if not inverse:
            xyz = _srgb_to_linear(x) @ _f64(C.M_LINEAR_RGB_TO_XYZ).T
            bar = xyz @ _f64(C.ICACB_M_XYZ_TO_RGBBAR).T
            return _pq_inv(bar) @ _f64(C.ICACB_M_RGBP_TO_ICACB).T
        bar = _pq(x @ _f64(C.ICACB_M_ICACB_TO_RGBP).T)
        xyz = bar @ _f64(C.ICACB_M_RGBBAR_TO_XYZ).T
        return _linear_to_srgb(xyz @ _f64(C.M_XYZ_TO_LINEAR_RGB).T)
    if space == "JzAzBz":
        b, g, d, d0, p = (C.JZAZBZ_B, C.JZAZBZ_G, C.JZAZBZ_D, C.JZAZBZ_D0,
                          C.JZAZBZ_P)
        if not inverse:
            xyz = _srgb_to_linear(x) @ _f64(C.M_LINEAR_RGB_TO_XYZ).T
            X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            xp = b * X - (b - 1) * Z
            yp = g * Y - (g - 1) * X
            lms = np.stack([xp, yp, Z], -1) @ _f64(C.JZAZBZ_M_XYZ_TO_LMS).T
            iz = _pq_inv(lms, m2=p) @ _f64(C.JZAZBZ_M_LMSP_TO_IZAZBZ).T
            jz = (1 + d) * iz[..., 0] / (1 + d * iz[..., 0]) - d0
            return np.stack([jz, iz[..., 1], iz[..., 2]], -1)
        jz = x[..., 0] + d0
        iz = jz / (1 + d - d * jz)
        lmsp = (np.stack([iz, x[..., 1], x[..., 2]], -1)
                @ _f64(C.JZAZBZ_M_IZAZBZ_TO_LMSP).T)
        xyzp = _pq(lmsp, m2=p) @ _f64(C.JZAZBZ_M_LMS_TO_XYZ).T
        X = (xyzp[..., 0] + (b - 1) * xyzp[..., 2]) / b
        Y = (xyzp[..., 1] + (g - 1) * X) / g
        xyz = np.stack([X, Y, xyzp[..., 2]], -1)
        return _linear_to_srgb(xyz @ _f64(C.M_XYZ_TO_LINEAR_RGB).T)
    raise ValueError(space)


_NORM = {
    "YCbCr": (C.YCBCR_MIDPOINTS, C.YCBCR_SCALES),
    "YCoCg": (C.YCOCG_MIDPOINTS, C.YCOCG_SCALES),
    "YCoCg-R": (C.YCOCG_R_MIDPOINTS, C.YCOCG_R_SCALES),
    "OKLAB": (C.OKLAB_MIDPOINTS, C.OKLAB_SCALES),
    "ICtCp": (C.ICTCP_MIDPOINTS, C.ICTCP_SCALES),
    "ICaCb": (C.ICACB_MIDPOINTS, C.ICACB_SCALES),
    "JzAzBz": (C.JZAZBZ_MIDPOINTS, C.JZAZBZ_SCALES),
}


# -------------------------------------------------------------- edge + tree
def edge_cv2(layer_f32):
    scaled = (layer_f32 * 255).astype(np.uint8)
    eq = cv.createCLAHE(clipLimit=0.75, tileGridSize=(4, 4)).apply(scaled)
    blur = cv.GaussianBlur(eq, (3, 3), 0)
    blur = cv.bilateralFilter(blur, 5, 75, 75)
    lo = np.percentile(blur, 10)
    hi = np.percentile(blur, 30)
    return cv.Canny(blur, lo, hi, apertureSize=3,
                    L2gradient=True).astype(np.float32) / 255.0


class _Tree:
    def __init__(self, edge, max_size, min_size):
        self.edge, self.max, self.min = edge, max_size, min_size
        self.h, self.w = edge.shape
        self.root = root_size_for(self.h, self.w)
        self.states = []
        self.leaves = []
        self._visit(0, 0, self.root)

    def _visit(self, x, y, size):
        if x >= self.w or y >= self.h:
            self.states.append("10")
            return
        region = self.edge[y:y + size, x:x + size]
        if size > self.max or (size > self.min and np.any(region == 1.0)):
            self.states.append("01")
            half = size // 2
            self._visit(x, y, half)
            self._visit(x + half, y, half)
            self._visit(x, y + half, half)
            self._visit(x + half, y + half, half)
        else:
            self.states.append("00")
            self.leaves.append((y, x, size))


# --------------------------------------------------------------- the codec
class OracleCodec:
    def __init__(self, color_space="YCoCg", quality_range=(40, 80),
                 block_size_range=(4, 64), edge_fn=edge_cv2):
        self.space = color_space
        self.qr = quality_range
        self.br = block_size_range
        self.edge_fn = edge_fn
        self.ratios = COLOR_SPACE_SETTINGS[color_space]["downsampling_ratios"]
        self.bases = [LUMA_QUANT, CHROMA_QUANT, CHROMA_QUANT]

    def _qtab(self, layer, size):
        q = quality_factor(size, self.br, self.qr)
        scale = 5000 / q if q < 50 else 200 - 2 * q
        scaled = np.floor((scale * self.bases[layer].astype(np.float64)
                           + 50) / 100)
        rs = cv.resize(scaled, (size, size), interpolation=cv.INTER_LINEAR)
        return np.clip(rs, 1, None).astype(np.int32)

    def compress(self, img_hwc_f32, extension=".png"):
        h, w = img_hwc_f32.shape[:2]
        conv = convert(self.space, img_hwc_f32.reshape(-1, 3)).astype(
            np.float32).reshape(h, w, 3).transpose(2, 0, 1)
        mids, scales = _NORM[self.space]

        out = BytesIO()
        meta = {"height": h, "width": w, "num_layers": 3,
                "color_space": self.space, "quality_min": self.qr[0],
                "quality_max": self.qr[1], "block_size_min": self.br[0],
                "block_size_max": self.br[1], "extension": extension}
        mb = json.dumps(meta).encode()
        out.write(len(mb).to_bytes(4, "big"))
        out.write(mb)

        for i in range(3):
            lh, lw = h // self.ratios[i][0], w // self.ratios[i][1]
            layer = cv.resize(conv[i], (lw, lh),
                              interpolation=cv.INTER_AREA)
            edge = self.edge_fn(layer)
            tree = _Tree(edge, self.br[1], self.br[0])
            norm = ((layer - mids[i]) * scales[i]).astype(np.float32)

            zz_all = []
            for y, x, size in tree.leaves:
                block = norm[y:y + size, x:x + size]
                ph, pw = size - block.shape[0], size - block.shape[1]
                if ph > 0 or pw > 0:
                    block = np.pad(block, ((0, ph), (0, pw)), mode="reflect")
                d = cv.dct(block)
                qb = np.round(d / self._qtab(i, size)).astype(np.int32)
                zz_all.append(qb.ravel()[zigzag_indices(size)])

            bits = "".join(tree.states)
            ba = bytearray()
            for k in range(0, len(bits), 8):
                ba.append(int(bits[k:k + 8].ljust(8, "0"), 2))
            out.write(len(bits).to_bytes(4, "big"))
            out.write(tree.root.to_bytes(4, "big"))
            out.write(bytes(ba))
            coeffs = (np.concatenate(zz_all) if zz_all
                      else np.zeros(0, np.int32))
            comp = zlib.compress(coeffs.astype("<i4").tobytes(), level=9)
            out.write(len(comp).to_bytes(4, "big"))
            out.write(comp)
        return out.getvalue()

    def decompress(self, blob):
        st = BytesIO(blob)
        mlen = int.from_bytes(st.read(4), "big")
        meta = json.loads(st.read(mlen))
        h, w = meta["height"], meta["width"]
        self.space = meta["color_space"]
        self.qr = (meta["quality_min"], meta["quality_max"])
        self.br = (meta["block_size_min"], meta["block_size_max"])
        self.ratios = COLOR_SPACE_SETTINGS[self.space]["downsampling_ratios"]
        mids, scales = _NORM[self.space]

        layers = []
        for i in range(3):
            bits_len = int.from_bytes(st.read(4), "big")
            root = int.from_bytes(st.read(4), "big")
            ba = st.read((bits_len + 7) // 8)
            states = []
            for byte in ba:
                s8 = format(byte, "08b")
                for k in range(0, 8, 2):
                    states.append(int(s8[k:k + 2], 2))
            states = states[:bits_len // 2]
            clen = int.from_bytes(st.read(4), "big")
            coeffs = np.frombuffer(zlib.decompress(st.read(clen)),
                                   dtype="<i4")

            lh, lw = h // self.ratios[i][0], w // self.ratios[i][1]
            canvas = np.zeros((root, root), np.float32)
            stack = [(0, 0, root)]
            idx = 0
            pos = 0
            while stack and idx < len(states):
                x, y, size = stack.pop()
                stt = states[idx]
                idx += 1
                if stt == 1:
                    half = size // 2
                    stack.append((x + half, y + half, half))
                    stack.append((x, y + half, half))
                    stack.append((x + half, y, half))
                    stack.append((x, y, half))
                elif stt == 0:
                    vec = coeffs[pos:pos + size * size]
                    pos += size * size
                    block = np.zeros(size * size, np.int32)
                    block[zigzag_indices(size)] = vec
                    deq = (block.reshape(size, size)
                           * self._qtab(i, size)).astype(np.float32)
                    canvas[y:y + size, x:x + size] = cv.idct(deq)
            layer = canvas[:lh, :lw] / scales[i] + mids[i]
            layers.append(cv.resize(layer, (w, h),
                                    interpolation=cv.INTER_LINEAR))
        stacked = np.stack(layers, axis=2).astype(np.float32)
        rgb = convert(self.space, stacked.reshape(-1, 3), inverse=True)
        return rgb.reshape(h, w, 3).astype(np.float32)
