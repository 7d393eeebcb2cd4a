from ocrautomator_ray.stages import extractors as ex


def test_plain_trim():
    assert ex.extract_plain("  hello world \n\t") == "hello world"


def test_sniff():
    assert ex.sniff_text_kind("plain words") == "plain"
    assert ex.sniff_text_kind(" <html><p>x</p></html>") == "html"
    assert ex.sniff_text_kind("%PDF-TXT\n1;1;x") == "pdftext"
    assert ex.sniff_text_kind("<br>") == "plain"  # no closing tag → not html


def test_html_strips_boilerplate():
    html = (
        "<html><head><script>var x;</script><style>a{}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<article><p>the main content paragraph lives here</p>"
        "<p>second real paragraph of content</p></article>"
        "<aside><a href='/r1'>rel one two</a></aside>"
        "<footer>© 2024 <a href='/p'>Privacy</a></footer></body></html>"
    )
    got = ex.extract_html_main_content(html)
    assert got == "the main content paragraph lives here\nsecond real paragraph of content"


def test_html_link_density_drops_link_farms():
    html = "<div><a href='/'>all of this text is links only</a></div>"
    assert ex.extract_html_main_content(html) == ""
    mixed = "<p>plenty of real words surround <a href='/'>tiny link</a> in this block</p>"
    assert "real words" in ex.extract_html_main_content(mixed)


def test_html_short_blocks_dropped():
    assert ex.extract_html_main_content("<p>two words</p>") == ""
    assert ex.extract_html_main_content("<p>now three words</p>") == "now three words"


def test_html_inline_tags_do_not_split_blocks():
    got = ex.extract_html_main_content("<p>one <b>bold</b> word inside</p>")
    assert got == "one bold word inside"


def test_pdf_layout_reading_order():
    txt = "%PDF-TXT\n300;20;world\n10;10;hello\n10;20;brave\n"
    assert ex.parse_pdf_layout(txt) == "hello\nbrave world"


def test_pdf_layout_skips_malformed():
    assert ex.parse_pdf_layout("%PDF-TXT\nnope\n5;5;ok\n;;x\n") == "ok"


def test_dispatch():
    assert ex.extract_text_span("  padded  ") == "padded"
