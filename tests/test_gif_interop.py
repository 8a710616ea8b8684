"""Interop oracle for the in-repo GIF codec: Java ImageIO (the
independent, spec-conformant implementation the container already
ships for Spark) must decode our streams BIT-EXACTLY and we must
decode its — GIF is lossless, so unlike the JPEG interop suite the
gate is exact pixel equality, not PSNR. Skipped without a JDK."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from cerberus_cpp_spark.sources import gifcodec as G

JAVA_SRC = r"""
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;

public class GifTool {
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
      ImageIO.write(img, "gif", new File(a[4]));
    } else {
      ImageInputStream is = ImageIO.createImageInputStream(new File(a[1]));
      ImageReader rd = ImageIO.getImageReaders(is).next();
      rd.setInput(is);
      BufferedImage img = rd.read(Integer.parseInt(a[2]));
      int w = img.getWidth(), h = img.getHeight();
      DataOutputStream out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(a[3])));
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


def _palette_image(seed: int, h: int, w: int, n: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    return pal[rng.randint(0, n, (h, w))]


@pytest.fixture(scope="module")
def gif_tool(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in container")
    d = tmp_path_factory.mktemp("giftool")
    (d / "GifTool.java").write_text(JAVA_SRC)
    r = subprocess.run(["javac", "GifTool.java"], cwd=d,
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:400]}")

    def run(*args: str) -> None:
        rr = subprocess.run(["java", "GifTool", *args], cwd=d,
                            capture_output=True, text=True, timeout=120)
        assert rr.returncode == 0, rr.stderr[:800]

    return d, run


def _java_dec(d, run, path, frame=0) -> np.ndarray:
    run("dec", str(path), str(frame), str(d / "out.raw"))
    raw = (d / "out.raw").read_bytes()
    w, h = struct.unpack(">II", raw[:8])
    return np.frombuffer(raw[8:], dtype=np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("interlace", [False, True])
def test_imageio_decodes_ours_bit_exact(gif_tool, interlace):
    d, run = gif_tool
    rgb = _palette_image(7, 21, 34, 31)
    (d / "ours.gif").write_bytes(G.encode_gif(rgb, interlace=interlace))
    assert np.array_equal(_java_dec(d, run, d / "ours.gif"), rgb)


def test_we_decode_imageio_bit_exact(gif_tool):
    d, run = gif_tool
    rgb = _palette_image(8, 21, 34, 31)
    (d / "src.raw").write_bytes(rgb.tobytes())
    run("enc", "34", "21", str(d / "src.raw"), str(d / "java.gif"))
    assert np.array_equal(G.decode_gif((d / "java.gif").read_bytes()),
                          rgb)


def test_imageio_reads_our_animation_frames(gif_tool):
    d, run = gif_tool
    base = _palette_image(9, 10, 12, 17)
    patch = _palette_image(10, 4, 6, 17)
    (d / "anim.gif").write_bytes(G.encode_gif_anim([
        G.GifFrame(base, delay_cs=5),
        G.GifFrame(patch, delay_cs=7, x=3, y=2),
    ]))
    # ImageIO returns RAW (uncomposed) frames — exactly our stored
    # subimages
    assert np.array_equal(_java_dec(d, run, d / "anim.gif", 0), base)
    assert np.array_equal(_java_dec(d, run, d / "anim.gif", 1), patch)


def test_lzw_reset_stream_decodes_in_imageio(gif_tool):
    d, run = gif_tool
    rgb = _palette_image(11, 120, 120, 200)  # forces dictionary reset
    (d / "big.gif").write_bytes(G.encode_gif(rgb))
    assert np.array_equal(_java_dec(d, run, d / "big.gif"), rgb)
