"""auplay — preload-then-play CLI (reference auplay.lua).

Pipeline identical to the reference: load by extension -> resample(48000) ->
mono -> normalize(0.8) -> lowpass(original_rate / 2) -> chunked stream ->
play. The speaker peripheral becomes a pluggable sink: a raw/WAV output file,
or a paced null sink.
"""

from __future__ import annotations

import argparse
import sys


def load_by_extension(path: str, data: bytes):
    import aukit_tpu as ak

    p = path.lower()
    if p.endswith(".dfpwm"):
        return ak.dfpwm(data, 1, 48000)
    if p.endswith(".wav"):
        return ak.wav(data)
    if p.endswith(".aif") or p.endswith(".aiff"):
        return ak.aiff(data)
    if p.endswith(".au"):
        return ak.au(data)
    if p.endswith(".flac"):
        return ak.flac(data)
    if p.endswith(".qoa"):
        return ak.qoa(data)
    if p.endswith(".mdfpwm"):
        return ak.mdfpwm(data)
    raise SystemExit("Unknown file type!")


def make_sink(out: str | None, realtime: bool):
    from aukit_tpu.playback import FileSink, NullSink

    if out:
        return FileSink(open(out, "wb"))
    return NullSink(realtime=realtime)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="auplay", description="Play an audio file (AUKit auplay equivalent)")
    ap.add_argument("file")
    ap.add_argument("-o", "--out", help="write 48kHz signed 8-bit samples to this file instead of a speaker")
    ap.add_argument("--realtime", action="store_true", help="pace the null sink at 48kHz like a real speaker")
    args = ap.parse_args(argv)

    import aukit_tpu as ak

    with open(args.file, "rb") as f:
        data = f.read()
    print("Loading file...")
    audio = load_by_extension(args.file, data)
    print("Resampling...")
    resamp = audio.resample(48000)
    print("Converting to mono...")
    mono = resamp.mono()
    print("Normalizing...")
    ak.effects.normalize(mono, 0.8)
    print("Applying filter...")
    ak.effects.lowpass(mono, audio.sample_rate / 2)
    print("Playing.")
    it, _length = mono.stream(48000)
    sink = make_sink(args.out, args.realtime)

    def play_iter():
        # Audio.stream yields raw 8-bit-range values; aukit.play consumed them
        # directly (reference auplay.lua:34)
        for vals, pos in it:
            yield vals, pos

    ak.play(play_iter(), sink)
    print("Done.")


if __name__ == "__main__":
    main(sys.argv[1:])
