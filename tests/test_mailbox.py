import pytest

from thecrowler_ray.sources.mailbox import parse_mbox, read_mail

MBOX = """From alice@example.com Mon Jan  1 10:00:00 2024
From: alice@example.com
Subject: Weekly crawler report
Date: Mon, 1 Jan 2024 10:00:00 +0000

The crawler fetched many pages this week with excellent throughput numbers.

From bob@example.com Tue Jan  2 11:00:00 2024
From: bob@example.com
Subject: Re: Weekly crawler report
Date: Tue, 2 Jan 2024 11:00:00 +0000

Thanks for the report about the crawler performance.
"""


def test_parse_mbox_shape():
    t = parse_mbox(MBOX, "team")
    assert t.num_rows == 2
    rows = t.to_pylist()
    assert rows[0]["title"] == "Weekly crawler report"
    assert rows[0]["sender"] == "alice@example.com"
    assert rows[0]["url"] == "mbox://team/0"
    kinds = [s["kind"] for s in rows[0]["spans"]]
    assert kinds[:3] == ["title", "summary", "body_text"]
    assert "keyword" in kinds
    kw = [s["text"] for s in rows[0]["spans"] if s["kind"] == "keyword"]
    assert "crawler" in kw
    # checkpoint resume: start_index skips already-processed messages
    t2 = parse_mbox(MBOX, "team", start_index=1)
    assert t2.num_rows == 1 and t2.to_pylist()[0]["msg_index"] == 1


@pytest.mark.usefixtures("ray_session")
def test_read_mail_dispatch():
    ds = read_mail("mbox://team", content=MBOX)
    assert ds.count() == 2
    with pytest.raises(NotImplementedError):
        read_mail("imap://mail.example.com")
    with pytest.raises(ValueError):
        read_mail("http://not-mail.example.com")
