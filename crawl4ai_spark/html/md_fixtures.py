"""Markdown byte-parity fixture battery.

Deterministic HTML documents covering every construct the markdown engine
handles (headings, emphasis, links/citations, images, lists, fences, tables,
blockquotes, entities, tag soup, the synthetic-corpus page shape). The golden
outputs for these fixtures are produced by EXECUTING the reference generator
(tools/gen_markdown_goldens.py) and committed; the engine must byte-match.

``FIXTURES[i]`` pairs with golden hash row i (md_goldens.GOLDEN_HASHES).
"""

FIXTURE_BASE = "https://host0.example/p/5"

FIXTURES: list[str] = [
    "",
    "plain text only",
    "<p>one</p><p>two</p>",
    "<h1>Title</h1><p>body</p>",
    "<h2>Two</h2><h3>Three</h3><h6>Six</h6>",
    "<p>Hello <b>world</b> and <strong>strong</strong></p>",
    "<p>em <em>phasis</em> i <i>talic</i> u <u>nder</u></p>",
    "<p>mix<b>bold</b>tail</p>",
    "<p>punct.<em>x</em>, end</p>",
    "<p>del <del>gone</del> strike <strike>old</strike> s <s>x</s></p>",
    "<p>a <code>inline code</code> b</p>",
    "<p>kbd <kbd>Ctrl</kbd> tt <tt>mono</tt></p>",
    "<pre>line1\nline2</pre>",
    "<pre><code>x = 1\ny = 2</code></pre>",
    "<pre>  indented\n\tstuff</pre>",
    "<ul><li>one</li><li>two</li></ul>",
    "<ol><li>first</li><li>second</li></ol>",
    "<ol start='4'><li>four</li><li>five</li></ol>",
    "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>",
    "<ol><li>a<ul><li>inner</li></ul></li></ol>",
    "<ul><li><p>para in li</p></li></ul>",
    "<blockquote>quoted text</blockquote>",
    "<blockquote><p>p1</p><p>p2</p></blockquote>",
    "<blockquote>outer<blockquote>inner</blockquote></blockquote>",
    "<p>before</p><hr><p>after</p>",
    "<p>line one<br>line two</p>",
    "<blockquote>a<br>b</blockquote>",
    '<a href="https://x.example/y">text</a>',
    '<a href="/rel">relative</a>',
    '<a href="https://x.example/y" title="The Title">text</a>',
    '<a href="https://x.example/y">https://x.example/y</a>',
    '<a href="#frag">internal</a>',
    '<a href="mailto:a@b.c">mail me</a>',
    '<a href="https://x.example">  </a>',
    '<a href="https://x.example"><b>bold link</b></a>',
    '<a href="https://x.example"><img src="/i.png" alt="pic"></a>',
    '<img src="/img.png" alt="An image">',
    '<img src="/img.png">',
    '<img src="https://cdn.example/a.jpg" alt="a[b]c">',
    "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>",
    "<table><thead><tr><th>a</th><th>b</th></tr></thead>"
    "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>",
    "<table><tr><td>only</td><td>data</td></tr></table>",
    "<p>a &amp; b &lt;c&gt; &quot;d&quot; &nbsp; e</p>",
    "<p>&mdash; &ndash; &copy; &rsquo; &ldquo;x&rdquo; &middot;</p>",
    "<p>&#65; &#x42; &#160; &#8212;</p>",
    "<p>unknown &fooo; entity</p>",
    "<p>back\\slash \\* literal</p>",
    "<p>stars *not emph* under_scores_</p>",
    "<head><title>t</title><style>p{color:red}</style></head><body><p>visible</p></body>",
    "<script>var x = '<p>no</p>';</script><p>yes</p>",
    "<div>div one</div><div>div two</div>",
    "<section><article><p>nested blocks</p></article></section>",
    "<p>  leading and trailing   </p>",
    "<p>multi\n\nline\ttext   runs</p>",
    "<q>quoted</q> and <q>again</q>",
    '<abbr title="Hyper Text">HTML</abbr> rules',
    "<dl><dt>term</dt><dd>definition</dd><dt>t2</dt><dd>d2</dd></dl>",
    "<p>sup x<sup>2</sup> sub a<sub>i</sub></p>",
    "<h1>Doc 5 - src1</h1><p>some text</p>"
    '<nav class="nav"><a href="/">home</a> <a href="/about">about</a></nav>',
    # synthetic-corpus page shape
    '<html lang="en"><head><title>Doc 5 - src1</title>'
    '<meta name="description" content="synthetic page 5">'
    '<meta name="keywords" content="k5, crawl, spark"></head><body>'
    '<nav class="nav"><a href="/">home</a> <a href="/about">about</a></nav>'
    "<article><h1>Heading 5</h1><p>some document text here</p>"
    "<pre><code>code block 5</code></pre>"
    "<table><thead><tr><th>a</th><th>b</th></tr></thead>"
    "<tbody><tr><td>1</td><td>5</td></tr></tbody></table>"
    '<img src="/img5.png" alt="alt 5" width="300" height="200">'
    '<a href="https://host11.example/p/11">child one</a> '
    '<a href="https://host12.example/p/12">child two</a> '
    '<a href="https://host18.example/p/38">cross link</a> '
    '<a href="https://host11.example/p/11?utm_source=x&fbclid=y#frag">tracking dup</a> '
    '<a href="https://external0.example/x">external</a>'
    "</article>"
    '<div class="sidebar">Low quality sidebar content with short text</div>'
    '<footer class="footer">footer boilerplate</footer></body></html>',
    # nasty combos
    "<p><b><i>both</i></b> and <em><strong>nested</strong></em></p>",
    "<p><b></b>empty marks<i></i></p>",
    "<ul><li>item with <a href='https://x.example'>link</a></li></ul>",
    "<blockquote><ul><li>quoted item</li></ul></blockquote>",
    "<table><tr><td><b>bold cell</b></td><td><a href='https://x.example'>l</a></td></tr></table>",
    "<p>text</p><ul><li>l1</li></ul><ul><li>l2</li></ul>",
    "<p>broken <b>unclosed",
    "<li>orphan item</li>",
    "<p>tail text",
    "text <b>then</b> 2bold <b>x</b>2 after",
    "<p>a<em>b</em>c</p>",
    "<p>(<em>paren</em>)</p>",
    "<pre>fence ``` inside</pre>",
    "<p>    ``` indented fence text</p>",
    "<h1><a href='https://x.example'>linked heading</a></h1>",
    "<a href='https://x.example'><h1>heading in link</h1></a>",
    "<p>a<br><br>b</p>",
    "<div><div><div>deep</div></div></div>",
    "<ul><li>one</li></ul><p>after list</p>",
    "<ol><li>1</li><li>2<ol><li>2a</li></ol></li></ol>",
    "<table><tr><th>h</th></tr></table><p>after table</p>",
    "<blockquote><pre>code in quote</pre></blockquote>",
    "<ul><li><pre>code in li</pre></li></ul>",
]
