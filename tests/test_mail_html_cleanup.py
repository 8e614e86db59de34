"""Email HTML cleanup pinned to the reference's conservative-marker
vector (pkg/mail/html_cleanup_test.go) plus the pixel-link rules."""

from thecrowler_ray.sources.mail_html_cleanup import cleanup_email_html


def test_reference_conservative_markers():
    cleaned = cleanup_email_html("""<body>
        <script>unsafe()</script>
        <div id="mcnPreviewText" style="max-height: 0; overflow: hidden">Preview</div>
        <img style="width: 1px; height: 1px" src="pixel.gif">
        <div id="divRplyFwdMsg">Reply header</div>
        <div class="preheader-content">Visible preheader discussion</div>
        <div class="gmail_quote_summary">Visible quote summary</div>
        <img width="120" height="40" src="logo.png">
    </body>""")
    for removed in ("unsafe()", "Preview", "pixel.gif", "Reply header"):
        assert removed not in cleaned, removed
    for preserved in ("Visible preheader discussion",
                      "Visible quote summary", "logo.png"):
        assert preserved in cleaned, preserved


def test_pixel_and_pixel_link_rules():
    # pixel needs BOTH dimensions known and <=1
    assert "onlywidth.gif" in cleanup_email_html(
        '<img width="1" src="onlywidth.gif">')
    assert "both.gif" not in cleanup_email_html(
        '<img width="1" height="1" src="both.gif">')
    # !important and px suffixes handled
    assert "imp.gif" not in cleanup_email_html(
        '<img style="width: 1px !important; height: 0px" src="imp.gif">')
    # anchor wrapping only a pixel (plus whitespace) goes too
    cleaned = cleanup_email_html(
        '<a href="https://t.example/open"> <img width="1" height="1" '
        'src="p.gif"> </a><a href="/real">keep <img width="1" height="1" '
        'src="p2.gif"></a>')
    assert "t.example/open" not in cleaned
    assert "/real" in cleaned  # anchor with real text survives


def test_preheader_needs_marker_and_hiding():
    # marker without hiding → kept; hiding without marker → kept
    assert "half" in cleanup_email_html(
        '<div class="preheader">half</div>')
    assert "other" in cleanup_email_html(
        '<div style="display:none">other</div>')
    # aria-hidden + marker → removed; boilerplate classes → removed
    assert "gone" not in cleanup_email_html(
        '<span class="preview-text" aria-hidden="true">gone</span>')
    assert "quoted" not in cleanup_email_html(
        '<div class="gmail_quote">quoted</div>')
