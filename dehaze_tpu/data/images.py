"""Image I/O — cv2 BGR→RGB float32 in [0,1].

Reference: `Uformer_ProbSparse/utils/image_utils.py:43-53` (load_img/save_img)
and the file-type predicates (`:11-24`). PIL fallback when cv2 is absent.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False


def is_png_file(filename: str) -> bool:
    return filename.lower().endswith(".png")


def is_image_file(filename: str) -> bool:
    return filename.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))


def load_img(path: str, u8: bool = False) -> np.ndarray:
    """[H, W, 3] float32 RGB in [0, 1] (cv2 BGR→RGB, /255).

    `u8=True` returns the raw uint8 RGB instead — the source fidelity of a
    PNG. Consumers normalize ON DEVICE (`train.trainer.u8_norm`), matching
    the /255 here to ≤1 ulp while transferring 4× fewer bytes host→device
    (and, on this relay transport, leaking 4× less host RSS — see DESIGN.md
    "RSS slope root cause")."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:  # pragma: no cover
        img = np.asarray(Image.open(path).convert("RGB"))
    if u8:
        return np.ascontiguousarray(img)
    return img.astype(np.float32) / 255.0


def save_img(path: str, img: np.ndarray) -> None:
    """Save [H, W, 3] float (0..1) or uint8 RGB."""
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    else:  # pragma: no cover
        Image.fromarray(img).save(path)


def decode_img(data: bytes, u8: bool = False) -> np.ndarray:
    """Encoded image bytes → [H, W, 3] float32 RGB in [0, 1] (load_img
    semantics for in-memory payloads — the HTTP serving path).

    `u8=True` returns raw uint8 RGB (see `load_img`): the serving forwards
    normalize on device, so requests ship 4× fewer bytes to the chip."""
    if _HAS_CV2:
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image payload")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:  # pragma: no cover
        import io

        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    if u8:
        return np.ascontiguousarray(img)
    return img.astype(np.float32) / 255.0


def encode_img(img: np.ndarray, ext: str = ".png") -> bytes:
    """[H, W, 3] float (0..1) or uint8 RGB → encoded bytes (save_img
    rounding)."""
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if _HAS_CV2:
        ok, buf = cv2.imencode(ext, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        if not ok:
            raise ValueError(f"cv2 failed to encode {ext}")
        return buf.tobytes()
    else:  # pragma: no cover
        import io

        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format=ext.lstrip(".").upper())
        return bio.getvalue()
