"""Response status-code taxonomy.

Same integer codes and meanings as the reference engine
(``cpp/include/task.h:13-61``; published table ``README.md:215-341``).
The pipeline never throws per row — every span gets exactly one
``(code, data)`` answer, reproducing the reference's
one-answer-per-request contract (``cpp/src/task.cpp:47-108``).
"""

from __future__ import annotations

from enum import IntEnum


class StatusCode(IntEnum):
    OK = 100                    # text found; data = result list
    NO_TEXT = 101               # no text recognized; data = ""
    JSON_PARSE_ERR = 200        # request JSON unparseable
    JSON_KEY_INVALID = 201      # no recognized task key
    PATH_NOT_EXIST = 202        # image path does not exist / no media row
    PATH_READ_FAIL = 203        # file/bytes exist but cannot be decoded
    IMAGE_DECODE_FAIL = 204     # decoder returned an empty image
    BASE64_DECODE_FAIL = 300    # base64 string unparseable
    BASE64_IMAGE_FAIL = 301     # base64 decoded but image decode failed
    CLIPBOARD_OPEN_FAIL = 400   # (not ported: interactive-only source)


#: codes that still carry a (possibly empty) result payload
SUCCESS_CODES = (StatusCode.OK, StatusCode.NO_TEXT)


def state_message(code: StatusCode, detail: str = "") -> str:
    """Human-readable error payload, mirroring Task::get_state_json
    (cpp/src/task.cpp:47-58)."""
    base = {
        StatusCode.OK: "",
        StatusCode.NO_TEXT: "No text found in image.",
        StatusCode.JSON_PARSE_ERR: "Invalid JSON request.",
        StatusCode.JSON_KEY_INVALID: "No valid task key in request.",
        StatusCode.PATH_NOT_EXIST: "Image path does not exist.",
        StatusCode.PATH_READ_FAIL: "Cannot read image file.",
        StatusCode.IMAGE_DECODE_FAIL: "Image decode failed.",
        StatusCode.BASE64_DECODE_FAIL: "Base64 decode failed.",
        StatusCode.BASE64_IMAGE_FAIL: "Base64 image decode failed.",
        StatusCode.CLIPBOARD_OPEN_FAIL: "Clipboard source not supported.",
    }[code]
    return f"{base} {detail}".strip()
