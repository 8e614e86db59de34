"""Static HTML extraction pinned to the reference's own test vectors
(pkg/browser/static_html_test.go)."""

from thecrowler_ray.static_html import extract_static_html


def test_malformed_document():
    content = extract_static_html(
        '<main><p>Hello <strong>world<a href="/broken">Broken')
    assert content["text"] == "Hello world Broken"
    assert content["links"] == [{"href": "/broken", "text": "Broken"}]


def test_omits_scripts_and_hidden_content():
    content = extract_static_html("""
        <html>
            <head><title>Hidden title</title>
            <style>.secret { display: block }</style></head>
            <body>
                Visible text
                <script>document.write('<a href="/injected">x</a>')</script>
                <template><a href="/template">Template link</a></template>
                <div hidden><a href="/hidden">Hidden link</a></div>
                <div aria-hidden="true">Aria hidden</div>
                <div style="display: none !important">Display hidden</div>
                <div style="visibility: collapse">Collapsed</div>
                <a href="/visible"><span>Visible</span> link</a>
            </body>
        </html>""")
    assert content["text"] == "Visible text Visible link"
    assert content["links"] == [{"href": "/visible",
                                 "text": "Visible link"}]


def test_area_links_and_blank_hrefs():
    content = extract_static_html(
        '<map><area href="/zone" alt="z"></map>'
        '<a href="  ">blank</a><a>none</a>'
        '<img src="https://t.example/pixel.png">')
    assert [ln["href"] for ln in content["links"]] == ["/zone"]
    # resource-bearing markup stays inert (no img URL anywhere)
    assert "pixel" not in str(content)


def test_hostile_inputs():
    for hostile in ("", "\x00\x00", "<a href=" + "x" * 100000 + ">",
                    "<div><p>unclosed", "<style>" * 500):
        extract_static_html(hostile)  # must not raise
