"""Image I/O + patching for the ViT encoder (maps paligemma/image.{h,cc}).

PPM(P6) read, nearest-neighbor resize, [-1, 1] normalization and
14x14x3 patch extraction in raster order (image.h:28-64).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Image:
    data: np.ndarray  # [H, W, 3] f32 in [-1, 1]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @classmethod
    def read_ppm(cls, path_or_bytes) -> "Image":
        """Binary P6 PPM, normalized to [-1, 1] (image.cc ReadPPM)."""
        if isinstance(path_or_bytes, (bytes, bytearray)):
            buf = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                buf = f.read()
        # Header: "P6" <ws> width <ws> height <ws> maxval <single ws> data.
        # '#' comments may appear between tokens.
        pos = 0

        def token():
            nonlocal pos
            while pos < len(buf):
                if buf[pos : pos + 1].isspace():
                    pos += 1
                elif buf[pos : pos + 1] == b"#":
                    while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                        pos += 1
                else:
                    break
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            return buf[start:pos]

        magic = token()
        if magic != b"P6":
            raise ValueError(f"Not a binary PPM (P6) file: {magic!r}")
        width = int(token())
        height = int(token())
        maxval = int(token())
        pos += 1  # single whitespace after maxval
        raw = np.frombuffer(buf, np.uint8, count=width * height * 3,
                            offset=pos)
        data = raw.reshape(height, width, 3).astype(np.float32)
        return cls(cls._normalize(data / maxval * 255.0))

    @classmethod
    def from_array(cls, data: np.ndarray) -> "Image":
        """Set() analog: [H, W, 3] u8/float 0..255, normalized to [-1, 1]."""
        return cls(cls._normalize(np.asarray(data, np.float32)))

    @staticmethod
    def _normalize(data_0_255: np.ndarray) -> np.ndarray:
        return (data_0_255 / 255.0) * 2.0 - 1.0

    def resize(self, width: int, height: int) -> "Image":
        """Nearest-neighbor (image.cc Resize)."""
        h, w = self.data.shape[:2]
        ys = (np.arange(height) * h // height).clip(0, h - 1)
        xs = (np.arange(width) * w // width).clip(0, w - 1)
        return Image(self.data[ys][:, xs])

    def get_patch(self, patch_num: int, patch_width: int = 14) -> np.ndarray:
        """Flattened [patch_width * patch_width * 3] patch, raster order."""
        per_row = self.width // patch_width
        r = (patch_num // per_row) * patch_width
        c = (patch_num % per_row) * patch_width
        return self.data[r : r + patch_width, c : c + patch_width].reshape(-1)

    def patches(self, patch_width: int = 14) -> np.ndarray:
        """All patches: [num_patches, patch_width^2 * 3]."""
        h, w = self.data.shape[:2]
        assert h % patch_width == 0 and w % patch_width == 0, (h, w)
        ph, pw = h // patch_width, w // patch_width
        x = self.data.reshape(ph, patch_width, pw, patch_width, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(ph * pw, -1)

    def write_binary(self, path: str) -> None:
        """Plain f32 dump (image.cc WriteBinary)."""
        self.data.astype(np.float32).tofile(path)
