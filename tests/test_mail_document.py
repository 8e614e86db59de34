"""End-to-end mail Document normalization tests (pkg/mail/processor.go
documentFromParsedMessage semantics over a crafted MIME corpus)."""

from email.mime.application import MIMEApplication
from email.mime.image import MIMEImage
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from thecrowler_ray.sources.mail_attachments import (
    AttachmentPolicy,
    Limits,
    attachment_document_descriptors,
)
from thecrowler_ray.sources.mail_document import process_message

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20


def _build_message():
    msg = MIMEMultipart("mixed")
    msg["Message-ID"] = "<root@Example.COM>"
    msg["Subject"] = "Weekly news"
    msg["From"] = "News <news@example.com>"
    msg["To"] = "reader@example.org"
    msg["Date"] = "Mon, 17 Aug 2026 09:00:00 +0000"
    msg["Authentication-Results"] = "mx; spf=pass; dkim=pass; dmarc=fail"
    alt = MIMEMultipart("alternative")
    alt.attach(MIMEText("plain text body", "plain"))
    alt.attach(MIMEText(
        '<p>Hello <a href="https://example.test/article">read</a> '
        '<a href="https://example.test/unsubscribe?u=1">unsubscribe</a>'
        '<img src="https://t.example/pixel.png"></p>'
        "<script>evil()</script>", "html"))
    msg.attach(alt)
    img = MIMEImage(PNG, "png")
    img.add_header("Content-Disposition", "attachment",
                   filename="logo.png")
    img.add_header("Content-Id", "<logo@example.com>")
    msg.attach(img)
    exe = MIMEApplication(b"MZ...", "x-msdownload")
    exe.add_header("Content-Disposition", "attachment", filename="bad.exe")
    msg.attach(exe)
    return msg


def test_document_end_to_end():
    doc = process_message(
        "src-1", _build_message().as_bytes(),
        policy=AttachmentPolicy(
            blocked_media_types=["application/x-msdownload"]),
        limits=Limits())
    assert doc["message_id"] == "<root@example.com>"
    assert doc["subject"] == "Weekly news"
    assert doc["from"][0]["normalized"] == "news@example.com"
    assert doc["text_body"] == "plain text body"
    assert "<a href" in doc["html_body"]
    # extracted text comes from the HTML body, script content dropped
    assert "Hello" in doc["extracted_text"]
    assert "evil()" not in doc["extracted_text"]
    # links classified; anchor text kept
    by_class = {ln["classification"]: ln for ln in doc["links"]}
    assert by_class["normal"]["text"] == "read"
    assert "unsubscribe" in by_class
    # accepted PNG attachment with sniffed type + sha; blocked exe warned
    assert len(doc["attachments"]) == 1
    att = doc["attachments"][0]
    assert att["filename"] == "logo.png"
    assert att["detected_media_type"] == "image/png"
    assert att["id"] == "logo@example.com"
    assert len(att["sha256"]) == 64
    codes = {w["code"] for w in doc["warnings"]}
    assert "attachment_media_type_blocked" in codes
    assert doc["security"]["dmarc"] == "fail"
    assert doc["date"].hour == 9
    # descriptors compose with the document output
    desc = attachment_document_descriptors(
        {"id": doc["message_id"], "uri": "imap://a/INBOX/1"},
        doc["attachments"])
    assert desc[0]["content_type"] == "image/png"
    assert desc[0]["parent_id"] == "<root@example.com>"


def test_embedded_message_recursion_and_depth():
    from email.mime.message import MIMEMessage

    inner = MIMEText("inner body", "plain")
    inner["Subject"] = "Inner"
    inner["Message-ID"] = "<inner@d.com>"
    outer = MIMEMultipart("mixed")
    outer["Subject"] = "Outer"
    outer.attach(MIMEText("outer body", "plain"))
    rfc = MIMEMessage(inner)
    rfc.add_header("Content-Disposition", "attachment",
                   filename="fwd.eml")
    outer.attach(rfc)
    doc = process_message("s", outer.as_bytes())
    assert doc["subject"] == "Outer"
    assert len(doc["child_documents"]) == 1
    child = doc["child_documents"][0]
    assert child["subject"] == "Inner"
    assert child["text_body"] == "inner body"
    assert child["parent_attachment_part_id"]
    # depth 0 disables recursion → the part falls through as attachment
    doc2 = process_message("s", outer.as_bytes(), max_embedded_depth=0)
    assert doc2["child_documents"] == []
    assert any(a["media_type"] == "message/rfc822"
               for a in doc2["attachments"])


def test_oversized_and_protected_parts():
    msg = MIMEMultipart("mixed")
    msg["Subject"] = "big"
    msg.attach(MIMEText("x" * 5000, "plain"))
    enc = MIMEApplication(b"\x00\x01", "pkcs7-mime")
    enc.add_header("Content-Disposition", "attachment", filename="e.p7m")
    msg.attach(enc)
    doc = process_message("s", msg.as_bytes(), max_part_bytes=100)
    assert len(doc["text_body"]) == 100
    codes = {w["code"] for w in doc["warnings"]}
    assert {"part_truncated", "encrypted_part"} <= codes
    # hostile input: not-an-email bytes must not raise
    doc2 = process_message("s", b"\xff\xfe complete garbage \x00")
    assert doc2["subject"] == ""
