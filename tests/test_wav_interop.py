"""Interop oracle for the WAV codec: Java's javax.sound.sampled
(shipped with the JDK) must read our PCM streams and we must read
its. Skipped when no JDK is available."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from cerberus_cpp_spark.sources.wavcodec import (
    decode_wav,
    encode_wav,
    synth_pcm,
)

JAVA_SRC = r"""
import javax.sound.sampled.*;
import java.io.*;

public class WavTool {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("dec")) {
      AudioInputStream in = AudioSystem.getAudioInputStream(new File(a[1]));
      AudioFormat f = in.getFormat();
      ByteArrayOutputStream buf = new ByteArrayOutputStream();
      byte[] chunk = new byte[4096];
      int n;
      while ((n = in.read(chunk)) > 0) buf.write(chunk, 0, n);
      DataOutputStream out = new DataOutputStream(new FileOutputStream(a[2]));
      out.writeInt((int) f.getSampleRate());
      out.writeInt(f.getChannels());
      out.writeInt(f.getSampleSizeInBits());
      out.writeInt(f.isBigEndian() ? 1 : 0);
      buf.writeTo(out);
      out.close();
    } else { // enc: raw little-endian int16 mono -> WAV
      int rate = Integer.parseInt(a[1]);
      byte[] raw = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(a[2]));
      AudioFormat f = new AudioFormat(rate, 16, 1, true, false);
      AudioInputStream in = new AudioInputStream(
          new ByteArrayInputStream(raw), f, raw.length / 2);
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, new File(a[3]));
    }
  }
}
"""


@pytest.fixture(scope="module")
def wav_tool(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in container")
    d = tmp_path_factory.mktemp("wavtool")
    (d / "WavTool.java").write_text(JAVA_SRC)
    r = subprocess.run(["javac", "WavTool.java"], cwd=d,
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:400]}")

    def run(*args: str) -> None:
        rr = subprocess.run(["java", "WavTool", *args], cwd=d,
                            capture_output=True, text=True, timeout=120)
        assert rr.returncode == 0, rr.stderr[:800]

    return d, run


def test_java_reads_our_wav(wav_tool):
    d, run = wav_tool
    s = synth_pcm(21, 4000)
    (d / "ours.wav").write_bytes(encode_wav(s, 16000))
    run("dec", str(d / "ours.wav"), str(d / "ours.raw"))
    raw = (d / "ours.raw").read_bytes()
    rate, nch, bits, be = struct.unpack(">IIII", raw[:16])
    assert (rate, nch, bits, be) == (16000, 1, 16, 0)
    pcm = np.frombuffer(raw[16:], dtype="<i2")
    assert np.array_equal(pcm, s)


def test_we_read_javas_wav(wav_tool):
    d, run = wav_tool
    s = synth_pcm(33, 3000)
    (d / "src.raw").write_bytes(s.astype("<i2").tobytes())
    run("enc", "8000", str(d / "src.raw"), str(d / "java.wav"))
    rate, arr = decode_wav((d / "java.wav").read_bytes())
    assert rate == 8000 and arr.shape == (3000, 1)
    assert np.array_equal(arr[:, 0], s)
