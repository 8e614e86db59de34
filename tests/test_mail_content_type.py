"""Attachment sniffing pinned to the reference's fixture table
(pkg/mail/content_type_test.go)."""

from thecrowler_ray.sources.mail_content_type import (
    attachment_media_types,
    looks_like_csv,
    looks_like_rfc822,
    media_types_clearly_inconsistent,
    sniff_attachment_media_type,
)

PDF = b"%PDF-1.7\n1 0 obj\n<<>>\nendobj"
HTML = b"<!DOCTYPE html>\n<html><body>hi</body></html>"
TXT = b"Just a plain note.\nSecond line.\n"
CSV = b"name,age,city\nalice,30,berlin\nbob,41,lyon\n"
EML = (b"From: a@x.test\nTo: b@x.test\nSubject: hi\n"
       b"MIME-Version: 1.0\n\nbody\n")
BIN = bytes(range(256))


def test_reference_fixture_table():
    cases = [
        (PDF, "application/octet-stream; name=report.pdf",
         ("application/octet-stream", "application/pdf")),
        (HTML, "", ("", "text/html")),
        (TXT, "application/pdf", ("application/pdf", "text/plain")),
        (CSV, "text/plain; charset=utf-8", ("text/plain", "text/csv")),
        (EML, "application/octet-stream",
         ("application/octet-stream", "message/rfc822")),
        (b"", "", ("", "application/octet-stream")),
        (BIN, "", ("", "application/octet-stream")),
    ]
    for content, declared, want in cases:
        assert attachment_media_types(declared, content) == want, declared
    # a compatible specific declaration is retained
    assert attachment_media_types("application/json; charset=utf-8",
                                  b'{"ok":true}') == \
        ("application/json", "application/json")


def test_sniff_bounded_and_heuristics():
    # sniffing never inspects beyond the 4 KiB cap
    # (reference attachmentSniffBytes, content_type.go:12)
    content = b"\x00" * 4096 + b"%PDF-1.7"
    assert sniff_attachment_media_type(content) == \
        "application/octet-stream"
    assert sniff_attachment_media_type(b"   \n\t ") == "text/plain"
    # rfc822 heuristic needs >=2 known headers incl. one mail-specific
    assert looks_like_rfc822(EML)
    assert not looks_like_rfc822(b"Content-Type: text/plain\n\nx")
    assert not looks_like_rfc822(b"no headers here")
    # csv needs >=2 rows x >=2 consistent columns
    assert looks_like_csv(CSV, False)
    assert not looks_like_csv(b"a,b,c\n", False)
    assert not looks_like_csv(b"a,b\nc\n", False)
    assert not looks_like_csv(b"a,b\n\x00c,d\n", False)
    # truncated samples cut at the last newline before judging
    assert looks_like_csv(CSV + b"partial,ro", True)


def test_inconsistency_rules():
    assert media_types_clearly_inconsistent("application/octet-stream",
                                            "text/plain")
    assert not media_types_clearly_inconsistent("application/octet-stream",
                                                "application/octet-stream")
    assert media_types_clearly_inconsistent("image/png", "application/pdf")
    # text/plain sniff only conflicts with non-textual declarations
    assert not media_types_clearly_inconsistent("application/json",
                                                "text/plain")
    assert not media_types_clearly_inconsistent("application/calendar+xml",
                                                "text/plain")
    assert media_types_clearly_inconsistent("image/png", "text/plain")
    assert not media_types_clearly_inconsistent("image/png",
                                                "image/webp")
