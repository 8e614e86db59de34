"""Attachment policy + descriptor tests (pkg/mail/attachment_policy.go,
attachment_descriptor.go)."""

from thecrowler_ray.sources.mail_attachments import (
    SKIP_BLOCKED,
    SKIP_COUNT,
    SKIP_DISABLED,
    SKIP_INLINE_DISABLED,
    SKIP_NOT_ALLOWED,
    SKIP_TOO_LARGE,
    SKIP_TOTAL_SIZE,
    AttachmentPolicy,
    AttachmentPolicyEvaluator,
    Limits,
    attachment_document_descriptors,
    matches_any_media_type,
    normalize_media_type,
)


def test_media_type_matching():
    assert normalize_media_type(" Application/PDF; name=x.pdf ") == \
        "application/pdf"
    assert normalize_media_type("garbage") == ""
    assert matches_any_media_type("image/png", ["image/*"])
    assert matches_any_media_type("IMAGE/PNG", ["image/png"])
    assert not matches_any_media_type("image/png", ["application/*"])


def _ev(policy=None, limits=None):
    return AttachmentPolicyEvaluator(policy or AttachmentPolicy(),
                                     limits or Limits())


def test_policy_gates():
    e = _ev(AttachmentPolicy(include=False))
    assert e.evaluate("1", "text/plain", "text/plain", 10, False)["code"] \
        == SKIP_DISABLED
    e = _ev(AttachmentPolicy(include_inline=False))
    assert e.evaluate("1", "image/png", "image/png", 10, True)["code"] \
        == SKIP_INLINE_DISABLED
    assert e.evaluate("1", "image/png", "image/png", 10, False) is None
    # denylist beats allowlist, and checks BOTH declared and detected
    e = _ev(AttachmentPolicy(allowed_media_types=["application/pdf"],
                             blocked_media_types=["application/*"]))
    assert e.evaluate("1", "application/pdf", "application/pdf",
                      10, False)["code"] == SKIP_BLOCKED
    e = _ev(AttachmentPolicy(blocked_media_types=["application/zip"]))
    assert e.evaluate("1", "application/zip", "text/plain",
                      10, False)["code"] == SKIP_BLOCKED
    # allowlist checks DETECTED type only
    e = _ev(AttachmentPolicy(allowed_media_types=["text/*"]))
    assert e.evaluate("1", "text/plain", "application/zip",
                      10, False)["code"] == SKIP_NOT_ALLOWED
    assert e.evaluate("2", "application/zip", "text/csv", 10, False) is None


def test_budgets_ignore_rejected():
    e = _ev(limits=Limits(max_attachment_bytes=100, max_attachments=2,
                          max_total_attachment_bytes=150))
    assert e.evaluate("1", "a/b", "a/b", 200, False)["code"] == \
        SKIP_TOO_LARGE
    # the rejected 200-byte part consumed no budget
    assert e.evaluate("2", "a/b", "a/b", 90, False) is None
    assert e.evaluate("3", "a/b", "a/b", 70, False)["code"] == \
        SKIP_TOTAL_SIZE  # 90+70 > 150
    assert e.evaluate("4", "a/b", "a/b", 60, False) is None
    assert e.evaluate("5", "a/b", "a/b", 1, False)["code"] == SKIP_COUNT
    assert (e.accepted_count, e.accepted_bytes) == (2, 150)


def test_descriptors_identity_and_order():
    parent = {"id": "doc-1", "uri": "imap://acct/INBOX/42"}
    atts = [
        {"id": "cid-1", "part_id": "1.1", "filename": "a.pdf",
         "sha256": "aa", "media_type": "application/pdf", "size": 10,
         "disposition": "attachment"},
        {"id": "", "part_id": "1.2", "filename": "b.png", "sha256": "bb",
         "media_type": "image/x-broken",
         "detected_media_type": "image/png", "size": 20,
         "disposition": "inline"},
        {"id": "cid-1", "part_id": "1.3", "filename": "dup.bin",
         "sha256": "cc", "media_type": "application/octet-stream",
         "size": 30, "disposition": "attachment"},
    ]
    desc = attachment_document_descriptors(parent, atts)
    assert [d["part_id"] for d in desc] == ["1.1", "1.2", "1.3"]
    assert desc[0]["id"] == "cid-1"
    assert len(desc[1]["id"]) == 64  # derived for the blank id
    assert desc[2]["id"] != "cid-1"  # duplicate id re-derived
    # detected media type wins over declared
    assert desc[1]["content_type"] == "image/png"
    assert all(d["relationship"] == "attachment" for d in desc)
    assert desc[0]["parent_uri"] == "imap://acct/INBOX/42"
    # byte-identical duplicates at different ordinals stay distinct
    same = {"id": "", "part_id": "x", "filename": "f", "sha256": "s",
            "media_type": "a/b", "size": 1, "disposition": "attachment"}
    d2 = attachment_document_descriptors(parent, [same, dict(same)])
    assert d2[0]["id"] != d2[1]["id"]
    assert attachment_document_descriptors(parent, []) == []
