"""Interop oracle for the in-repo BMP codec: Java ImageIO (the
independent, spec-conformant implementation the container already
ships for Spark) must decode our streams BIT-EXACTLY and we must
decode its. BMP is lossless at >=24 bpp so the gate is exact pixel
equality; the 16-bit paths are fed on-grid pixels so the 5/6-bit
quantization is exact too (channel expansion pinned to
DirectColorModel's round(v*255/maxv)). Skipped without a JDK."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from cerberus_cpp_spark.sources import bmpcodec as B

JAVA_SRC = r"""
import javax.imageio.*;
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;

public class BmpTool {
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
      if (!ImageIO.write(img, "bmp", new File(a[4])))
        throw new RuntimeException("no BMP writer");
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      int w = img.getWidth(), h = img.getHeight();
      DataOutputStream out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(a[2])));
      out.writeInt(w); out.writeInt(h);
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        int rgb = img.getRGB(x, y);
        out.writeByte((rgb >> 16) & 255);
        out.writeByte((rgb >> 8) & 255);
        out.writeByte(rgb & 255);
      }
      out.close();
    }
  }
}
"""


@pytest.fixture(scope="module")
def bmp_tool(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in container")
    d = tmp_path_factory.mktemp("bmptool")
    (d / "BmpTool.java").write_text(JAVA_SRC)
    r = subprocess.run(["javac", "BmpTool.java"], cwd=d,
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:400]}")

    def run(*args: str) -> None:
        rr = subprocess.run(["java", "BmpTool", *args], cwd=d,
                            capture_output=True, text=True, timeout=120)
        assert rr.returncode == 0, rr.stderr[:800]

    return d, run


def _java_decode(tool, path) -> np.ndarray:
    d, run = tool
    run("dec", str(path), str(d / "out.raw"))
    raw = (d / "out.raw").read_bytes()
    w, h = struct.unpack(">II", raw[:8])
    return np.frombuffer(raw, np.uint8, w * h * 3, 8).reshape(h, w, 3)


def test_java_encodes_we_decode(bmp_tool):
    d, run = bmp_tool
    img = np.random.RandomState(3).randint(
        0, 256, (13, 17, 3)).astype(np.uint8)
    (d / "in.raw").write_bytes(img.tobytes())
    run("enc", "17", "13", str(d / "in.raw"), str(d / "java.bmp"))
    data = (d / "java.bmp").read_bytes()
    assert B.sniff_bmp(data)
    assert B.bmp_header_info(data) == (17, 13)
    assert np.array_equal(B.decode_bmp(data), img)


@pytest.mark.parametrize("kw", [
    dict(bpp=24), dict(bpp=24, top_down=True), dict(bpp=32),
    dict(bpp=32, top_down=True),
])
def test_we_encode_truecolor_java_decodes(bmp_tool, kw):
    d, _ = bmp_tool
    img = np.random.RandomState(
        kw["bpp"] + 2 * kw.get("top_down", False)).randint(
        0, 256, (9, 14, 3)).astype(np.uint8)
    (d / "ours.bmp").write_bytes(B.encode_bmp(img, **kw))
    assert np.array_equal(_java_decode(bmp_tool, d / "ours.bmp"), img)


@pytest.mark.parametrize("bpp,rle", [(8, False), (8, True), (4, False),
                                     (1, False)])
def test_we_encode_palette_java_decodes(bmp_tool, bpp, rle):
    d, _ = bmp_tool
    rng = np.random.RandomState(bpp + rle)
    n = min(1 << bpp, 16)
    pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    img = pal[rng.randint(0, n, (9, 11))]
    (d / "ours.bmp").write_bytes(B.encode_bmp(img, bpp=bpp, rle=rle))
    assert np.array_equal(_java_decode(bmp_tool, d / "ours.bmp"), img)


@pytest.mark.parametrize("bitfields_565", [False, True])
def test_we_encode_16bit_java_decodes(bmp_tool, bitfields_565):
    """Our 16-bit decode must agree with DirectColorModel's channel
    scaling — compare Java's decode of our stream against OUR decode
    of the same stream (both from on-grid pixels)."""
    d, _ = bmp_tool
    rng = np.random.RandomState(42 + bitfields_565)
    r = rng.randint(0, 32, (5, 9))
    g = rng.randint(0, 64 if bitfields_565 else 32, (5, 9))
    b = rng.randint(0, 32, (5, 9))
    src = np.stack(
        [r << 3, g << (2 if bitfields_565 else 3), b << 3],
        -1).astype(np.uint8)
    data = B.encode_bmp(src, bpp=16, bitfields_565=bitfields_565)
    (d / "ours.bmp").write_bytes(data)
    assert np.array_equal(_java_decode(bmp_tool, d / "ours.bmp"),
                          B.decode_bmp(data))
