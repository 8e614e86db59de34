"""Link classification pinned to the reference's OWN test table
(pkg/mail/link_classification_test.go:14-54) — every vector, verbatim."""

import pytest

from thecrowler_ray.sources.mail_links import classify_link

VECTORS = [
    ("https://example.test/articles/42?utm_source=newsletter", "normal"),
    ("https://example.test/article?utm_campaign=unsubscribe-tips", "normal"),
    ("../account/details?tab=profile", "normal"),
    ("?page=2", "normal"),
    ("#section", "normal"),
    ("//cdn.example.test/document", "normal"),
    ("https://links.example.test/track/click/abc123", "tracking"),
    ("https://example.test/out?redirect_url=https%3A%2F%2Fdestination.test",
     "tracking"),
    ("HTTPS://TRACK.Example.Test/o/abc", "tracking"),
    ("https://example.test/open-pixel.gif", "tracking"),
    ("https://example.test/email/unsubscribe?token=abc", "unsubscribe"),
    ("https://example.test/Email/UnSubscribe?id=42", "unsubscribe"),
    ("https://example.test/click?target=https%3A%2F%2Faccount.test%2F"
     "opt-out", "unsubscribe"),
    ("https://example.test/account/verify-email?token=abc", "auth_action"),
    ("https://example.test/verify?token=abc", "auth_action"),
    ("https://example.test/articles/verify", "normal"),
    ("https://example.test/RESET_PASSWORD/abc", "auth_action"),
    ("https://example.test/events/meeting.ICS?download=1", "calendar"),
    ("https://example.test/calendar/render?action=TEMPLATE", "calendar"),
    ("WEBCAL://calendar.example.test/team", "calendar"),
    ("MailTo:Person@Example.Test?subject=Hello", "mailto"),
    ("CID:logo@example.test", "cid"),
    ("https://images.example.test/banner.PNG?width=600", "remote_image"),
    ("https://cdn.example.test/asset?id=4&format=webp", "remote_image"),
    ("//cdn.example.test/images/banner?id=4", "remote_image"),
    ("https://example.test/unsubscribe/button.png", "unsubscribe"),
    ("https://example.test/redirect?target=https%3A%2F%2Fid.test%2F"
     "magic-link%2Fabc", "auth_action"),
    ("https://example.test/%zz", "unknown"),
    ("https:///missing-host", "unknown"),
    ("https://example.test/not allowed", "unknown"),
    ("JaVaScRiPt:alert(1)", "unknown"),
    ("data:image/png;base64,AAAA", "unknown"),
    ("mailto:not-an-address", "unknown"),
    ("mailto:", "unknown"),
    ("cid:", "unknown"),
    ("#", "unknown"),
    ("  ", "unknown"),
]


@pytest.mark.parametrize("url,wanted", VECTORS)
def test_reference_vectors(url, wanted):
    assert classify_link(url) == wanted
