"""Transcript output writers: txt / vtt / srt / csv / json / lrc.

Mirrors the output family of the reference CLI
(/root/reference/thirdparty/whisper.cpp/examples/main/main.cpp:80-169 output
flags and the corresponding output_* functions).
"""

from __future__ import annotations

import json
from typing import List

from ..decode.loop import Segment


def _ts(t: int, comma: bool = False) -> str:
    """Centiseconds -> "HH:MM:SS.mmm" (to_timestamp, examples/main)."""
    msec = t * 10
    hr = msec // 3600000
    msec -= hr * 3600000
    mins = msec // 60000
    msec -= mins * 60000
    sec = msec // 1000
    msec -= sec * 1000
    sep = "," if comma else "."
    return f"{hr:02d}:{mins:02d}:{sec:02d}{sep}{msec:03d}"


def to_txt(segments: List[Segment]) -> str:
    return "".join(s.text for s in segments).strip() + "\n"


def to_vtt(segments: List[Segment]) -> str:
    out = ["WEBVTT", ""]
    for s in segments:
        speaker = "<v Speaker>" if s.speaker_turn_next else ""
        out.append(f"{_ts(s.t0)} --> {_ts(s.t1)}")
        out.append(f"{speaker}{s.text.strip()}")
        out.append("")
    return "\n".join(out)


def to_srt(segments: List[Segment]) -> str:
    out = []
    for i, s in enumerate(segments, 1):
        out.append(str(i))
        out.append(f"{_ts(s.t0, comma=True)} --> {_ts(s.t1, comma=True)}")
        out.append(s.text.strip())
        out.append("")
    return "\n".join(out)


def to_csv(segments: List[Segment]) -> str:
    lines = ["start,end,text"]
    for s in segments:
        text = s.text.strip().replace('"', '""')
        lines.append(f'{s.t0 * 10},{s.t1 * 10},"{text}"')
    return "\n".join(lines) + "\n"


def to_lrc(segments: List[Segment]) -> str:
    out = ["[by:godot_whisper_tpu]"]
    for s in segments:
        msec = s.t0 * 10
        mins = msec // 60000
        msec -= mins * 60000
        sec = msec // 1000
        msec -= sec * 1000
        out.append(f"[{mins:02d}:{sec:02d}.{msec // 10:02d}]{s.text.strip()}")
    return "\n".join(out) + "\n"


def to_json(segments: List[Segment], *, model_name: str = "",
            language: str = "", full: bool = False) -> str:
    data = {
        "systeminfo": "godot_whisper_tpu (JAX/XLA TPU backend)",
        "model": {"type": model_name},
        "params": {"language": language},
        "transcription": [],
    }
    for s in segments:
        seg = {
            "timestamps": {"from": _ts(s.t0, comma=True),
                           "to": _ts(s.t1, comma=True)},
            "offsets": {"from": s.t0 * 10, "to": s.t1 * 10},
            "text": s.text,
        }
        if full:
            seg["tokens"] = [
                {"text": None, "id": t.id, "p": t.p,
                 "timestamps": {"from": _ts(max(t.t0, 0), comma=True),
                                "to": _ts(max(t.t1, 0), comma=True)}}
                for t in s.tokens
            ]
        if s.speaker_turn_next:
            seg["speaker_turn_next"] = True
        data["transcription"].append(seg)
    return json.dumps(data, indent=2, ensure_ascii=False) + "\n"
