"""Interop oracle for the in-repo TIFF codec: Java ImageIO's TIFF
plugin (independent, spec-conformant, in the JDK since Java 9) must
decode our streams BIT-EXACTLY and we must decode its — the suite
crosses compression codecs (none/LZW/ZLib/PackBits/Deflate), both
byte orders, predictor, strip and tile layouts, and the
gray/palette photometrics. Gray images are compared on RAW raster
samples (Java's getRGB routes gray through an ICC profile — a
color-management step, not a codec difference). Skipped without a
JDK."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from cerberus_cpp_spark.sources import tiffcodec as T

JAVA_SRC = r"""
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;

public class TiffTool {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("enc")) {
      int w = Integer.parseInt(a[1]), h = Integer.parseInt(a[2]);
      byte[] raw = Files.readAllBytes(Paths.get(a[3]));
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
      int i = 0;
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        int r = raw[i++] & 255, g = raw[i++] & 255, b = raw[i++] & 255;
        img.setRGB(x, y, (r << 16) | (g << 8) | b);
      }
      ImageWriter wr = ImageIO.getImageWritersByFormatName("tiff").next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      if (!a[5].equals("none")) {
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionType(a[5]);
      }
      ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[4]));
      wr.setOutput(os);
      wr.write(null, new IIOImage(img, null, null), p);
      os.close();
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      int w = img.getWidth(), h = img.getHeight();
      DataOutputStream out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(a[2])));
      out.writeInt(w); out.writeInt(h);
      Raster ra = img.getRaster();
      boolean gray = ra.getNumBands() == 1
          && !(img.getColorModel() instanceof IndexColorModel);
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        if (gray) {
          int v = ra.getSample(x, y, 0);
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
def tiff_tool(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in container")
    d = tmp_path_factory.mktemp("tifftool")
    (d / "TiffTool.java").write_text(JAVA_SRC)
    r = subprocess.run(["javac", "TiffTool.java"], cwd=d,
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:400]}")

    def run(*args: str) -> None:
        rr = subprocess.run(["java", "TiffTool", *args], cwd=d,
                            capture_output=True, text=True, timeout=120)
        assert rr.returncode == 0, rr.stderr[:800]

    return d, run


def _java_decode(tool, path) -> np.ndarray:
    d, run = tool
    run("dec", str(path), str(d / "out.raw"))
    raw = (d / "out.raw").read_bytes()
    w, h = struct.unpack(">II", raw[:8])
    return np.frombuffer(raw, np.uint8, w * h * 3, 8).reshape(h, w, 3)


@pytest.mark.parametrize("comp", ["none", "LZW", "ZLib", "PackBits",
                                  "Deflate"])
def test_java_encodes_we_decode(tiff_tool, comp):
    d, run = tiff_tool
    img = np.random.RandomState(5).randint(
        0, 256, (37, 41, 3)).astype(np.uint8)
    (d / "in.raw").write_bytes(img.tobytes())
    run("enc", "41", "37", str(d / "in.raw"), str(d / "java.tif"), comp)
    data = (d / "java.tif").read_bytes()
    assert T.sniff_tiff(data)
    assert T.tiff_header_info(data) == (41, 37)
    assert np.array_equal(T.decode_tiff(data), img)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(compression="packbits"),
    dict(compression="lzw"),
    dict(compression="lzw", predictor=True),
    dict(compression="deflate"),
    dict(compression="deflate", predictor=True),
    dict(byte_order=">"),
    dict(byte_order=">", compression="lzw"),
    dict(tile=16),
    dict(tile=16, compression="lzw", predictor=True),
    dict(rows_per_strip=5, compression="packbits"),
])
def test_we_encode_rgb_java_decodes(tiff_tool, kw):
    d, _ = tiff_tool
    img = np.random.RandomState(len(str(sorted(kw)))).randint(
        0, 256, (23, 19, 3)).astype(np.uint8)
    (d / "ours.tif").write_bytes(T.encode_tiff(img, **kw))
    assert np.array_equal(_java_decode(tiff_tool, d / "ours.tif"), img)


@pytest.mark.parametrize("mode", ["gray", "gray0"])
def test_we_encode_gray_java_decodes(tiff_tool, mode):
    d, _ = tiff_tool
    g = np.repeat(np.random.RandomState(8).randint(
        0, 256, (9, 11, 1)).astype(np.uint8), 3, axis=2)
    (d / "ours.tif").write_bytes(
        T.encode_tiff(g, mode=mode, compression="lzw"))
    assert np.array_equal(_java_decode(tiff_tool, d / "ours.tif"), g)


def test_we_encode_palette_java_decodes(tiff_tool):
    d, _ = tiff_tool
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (100, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 100, (7, 23))]
    (d / "ours.tif").write_bytes(
        T.encode_tiff(img, mode="palette", compression="packbits"))
    assert np.array_equal(_java_decode(tiff_tool, d / "ours.tif"), img)


def test_lzw_reset_stream_java_decodes(tiff_tool):
    """~50 KB incompressible single strip: exercises every LZW width
    plus the 4094-entry dictionary reset against the independent
    reader."""
    d, _ = tiff_tool
    img = np.random.RandomState(8).randint(
        0, 256, (128, 130, 3)).astype(np.uint8)
    (d / "ours.tif").write_bytes(
        T.encode_tiff(img, compression="lzw", rows_per_strip=128))
    assert np.array_equal(_java_decode(tiff_tool, d / "ours.tif"), img)
