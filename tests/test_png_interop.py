"""Interop oracle for the full PNG codec: Java ImageIO's PNG plugin
(independent, spec-conformant) must decode our streams BIT-EXACTLY
and we must decode its — crossing color types (gray / gray16 /
bilevel / indexed / RGB / ARGB on the Java side; every encode_png_ex
mode on ours), scanline filters, 16-bit depth, and Adam7 interlace.
Gray images are compared on RAW raster samples (Java's getRGB routes
gray through an ICC profile — color management, not codec). Skipped
without a JDK."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from cerberus_cpp_spark.sources import pngcodec as P

JAVA_SRC = r"""
import javax.imageio.*;
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;

public class PngTool {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("enc")) {
      String t = a[1];
      int w = Integer.parseInt(a[2]), h = Integer.parseInt(a[3]);
      byte[] raw = Files.readAllBytes(Paths.get(a[4]));
      int type = switch (t) {
        case "rgb" -> BufferedImage.TYPE_INT_RGB;
        case "argb" -> BufferedImage.TYPE_INT_ARGB;
        case "gray" -> BufferedImage.TYPE_BYTE_GRAY;
        case "gray16" -> BufferedImage.TYPE_USHORT_GRAY;
        case "binary" -> BufferedImage.TYPE_BYTE_BINARY;
        case "indexed" -> BufferedImage.TYPE_BYTE_INDEXED;
        default -> throw new RuntimeException(t);
      };
      BufferedImage img = new BufferedImage(w, h, type);
      int i = 0;
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        int r = raw[i++] & 255, g = raw[i++] & 255, b = raw[i++] & 255;
        if (type == BufferedImage.TYPE_BYTE_GRAY
            || type == BufferedImage.TYPE_USHORT_GRAY) {
          img.getRaster().setSample(x, y, 0,
              type == BufferedImage.TYPE_USHORT_GRAY ? r * 257 : r);
        } else {
          img.setRGB(x, y, (0xFF << 24) | (r << 16) | (g << 8) | b);
        }
      }
      if (!ImageIO.write(img, "png", new File(a[5])))
        throw new RuntimeException("no writer");
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      int w = img.getWidth(), h = img.getHeight();
      DataOutputStream out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(a[2])));
      out.writeInt(w); out.writeInt(h);
      Raster ra = img.getRaster();
      boolean gray = (ra.getNumBands() == 1 || ra.getNumBands() == 2)
          && !(img.getColorModel() instanceof IndexColorModel)
          && img.getColorModel().getColorSpace().getNumComponents() == 1;
      boolean gray16 = gray
          && img.getColorModel().getComponentSize(0) == 16;
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        if (gray) {
          int v = ra.getSample(x, y, 0);
          if (gray16) v = v >> 8;
          else if (img.getColorModel().getComponentSize(0) < 8) {
            int max = (1 << img.getColorModel().getComponentSize(0)) - 1;
            v = (v * 255 + max / 2) / max;
          }
          out.writeByte(v); out.writeByte(v); out.writeByte(v);
        } else {
          int rgb = img.getRGB(x, y);
          out.writeByte((rgb >> 16) & 255);
          out.writeByte((rgb >> 8) & 255);
          out.writeByte(rgb & 255);
        }
      }
      out.close();
    }
  }
}
"""


@pytest.fixture(scope="module")
def png_tool(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in container")
    d = tmp_path_factory.mktemp("pngtool")
    (d / "PngTool.java").write_text(JAVA_SRC)
    r = subprocess.run(["javac", "PngTool.java"], cwd=d,
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:400]}")

    def run(*args: str) -> None:
        rr = subprocess.run(["java", "PngTool", *args], cwd=d,
                            capture_output=True, text=True, timeout=120)
        assert rr.returncode == 0, rr.stderr[:800]

    return d, run


def _java_decode(tool, path) -> np.ndarray:
    d, run = tool
    run("dec", str(path), str(d / "out.raw"))
    raw = (d / "out.raw").read_bytes()
    w, h = struct.unpack(">II", raw[:8])
    return np.frombuffer(raw, np.uint8, w * h * 3, 8).reshape(h, w, 3)


def _java_encode(tool, img: np.ndarray, jtype: str) -> bytes:
    d, run = tool
    (d / "in.raw").write_bytes(img.tobytes())
    h, w, _ = img.shape
    run("enc", jtype, str(w), str(h), str(d / "in.raw"),
        str(d / "java.png"))
    return (d / "java.png").read_bytes()


@pytest.mark.parametrize("jtype", ["rgb", "argb", "gray", "gray16",
                                   "binary", "indexed"])
def test_java_encodes_we_decode(png_tool, jtype):
    rng = np.random.RandomState(2)
    if jtype in ("gray", "gray16"):
        ref = np.repeat(rng.randint(0, 256, (9, 11, 1)), 3,
                        axis=2).astype(np.uint8)
    elif jtype == "binary":
        ref = np.repeat(rng.randint(0, 2, (9, 11, 1)) * 255, 3,
                        axis=2).astype(np.uint8)
    else:
        ref = rng.randint(0, 256, (23, 31, 3)).astype(np.uint8)
    data = _java_encode(png_tool, ref, jtype)
    assert P.sniff_png(data)
    out = P.decode_png(data)
    if jtype == "indexed":
        # the indexed writer quantizes: our decode must equal JAVA'S
        # own decode of the same stream, not the pre-quantized input
        d, _ = png_tool
        assert np.array_equal(out, _java_decode(png_tool,
                                                d / "java.png"))
    else:
        assert np.array_equal(out, ref)


@pytest.mark.parametrize("kw", [
    dict(), dict(filter_mode=1), dict(filter_mode=2),
    dict(filter_mode=3), dict(filter_mode=4), dict(interlace=True),
    dict(filter_mode="adaptive", interlace=True), dict(mode="rgba"),
    dict(depth=16), dict(depth=16, interlace=True),
])
def test_we_encode_rgb_java_decodes(png_tool, kw):
    d, _ = png_tool
    img = np.random.RandomState(len(str(sorted(kw)))).randint(
        0, 256, (19, 15, 3)).astype(np.uint8)
    (d / "ours.png").write_bytes(P.encode_png_ex(img, **kw))
    assert np.array_equal(_java_decode(png_tool, d / "ours.png"), img)


@pytest.mark.parametrize("mode,depth", [("gray", 8), ("gray", 16),
                                        ("gray_alpha", 8),
                                        ("gray_alpha", 16)])
def test_we_encode_gray_java_decodes(png_tool, mode, depth):
    d, _ = png_tool
    g = np.repeat(np.random.RandomState(8).randint(
        0, 256, (9, 11, 1)).astype(np.uint8), 3, axis=2)
    (d / "ours.png").write_bytes(
        P.encode_png_ex(g, mode=mode, depth=depth))
    assert np.array_equal(_java_decode(png_tool, d / "ours.png"), g)


@pytest.mark.parametrize("interlace", [False, True])
def test_we_encode_palette_java_decodes(png_tool, interlace):
    d, _ = png_tool
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (40, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 40, (7, 23))]
    (d / "ours.png").write_bytes(
        P.encode_png_ex(img, mode="palette", interlace=interlace))
    assert np.array_equal(_java_decode(png_tool, d / "ours.png"), img)
