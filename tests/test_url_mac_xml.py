"""URL long-tail, MAC coding, XML/HTML decode (reference
src/Functions/URL/, FunctionsCodingIP.cpp:636 formatMAC,
decodeXMLComponent.cpp, extractTextFromHTML.cpp)."""

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch

URL = "https://www.example.com:8080/browse/CONV-6788?a=1&b=2#frag"


def test_url_longtail(spark):
    r = spark.range(1).select(
        ch.port(F.lit(URL)).alias("port"),
        ch.port(F.lit("http://x.com/"), 80).alias("port_d"),
        ch.cutWWW(F.lit(URL)).alias("nw"),
        ch.queryStringAndFragment(F.lit(URL)).alias("qsf"),
        ch.cutQueryStringAndFragment(F.lit(URL)).alias("cqsf"),
        ch.cutURLParameter(F.lit(URL), "a").alias("cupa"),
        ch.cutURLParameter(F.lit(URL), "b").alias("cupb"),
        ch.extractURLParameterNames(F.lit(URL)).alias("names"),
    ).first()
    assert r["port"] == 8080 and r["port_d"] == 80
    assert r["nw"] == "https://example.com:8080/browse/CONV-6788?a=1&b=2#frag"
    assert r["qsf"] == "a=1&b=2#frag"
    assert r["cqsf"] == "https://www.example.com:8080/browse/CONV-6788"
    assert r["cupa"] == "https://www.example.com:8080/browse/CONV-6788?b=2#frag"
    assert r["cupb"] == "https://www.example.com:8080/browse/CONV-6788?a=1#frag"
    assert r["names"] == ["a", "b"]


def test_url_hierarchy(spark):
    r = spark.range(1).select(
        ch.URLHierarchy(F.lit("https://example.com/browse/CONV-6788")).alias("uh"),
        ch.URLPathHierarchy(F.lit("https://example.com/browse/CONV-6788")).alias("uph"),
        ch.URLHierarchy(F.lit("no-protocol-here")).alias("empty"),
    ).first()
    assert r["uh"] == ["https://example.com/", "https://example.com/browse/",
                       "https://example.com/browse/CONV-6788"]
    assert r["uph"] == ["/browse/", "/browse/CONV-6788"]
    assert r["empty"] == []


def test_first_significant_subdomain_reference_semantics(spark):
    cases = [
        ("https://news.clicks.paris.example.com/path", "example", "example.com"),
        ("http://www.example.com/", "example", "example.com"),
        ("http://sub.shop.co.uk/x", "shop", "shop.co.uk"),
        ("http://example.com", "example", "example.com"),
    ]
    df = spark.createDataFrame(cases, "u string, e string, c string")
    for r in df.select(
            "u", "e", "c",
            ch.firstSignificantSubdomain(F.col("u")).alias("fss"),
            ch.cutToFirstSignificantSubdomain(F.col("u")).alias("cut")).collect():
        assert r["fss"] == r["e"], r["u"]
        assert r["cut"] == r["c"], r["u"]


def test_mac_roundtrip(spark):
    r = spark.range(1).select(
        ch.MACNumToString(F.lit(0x010203040506)).alias("s"),
        ch.MACStringToNum(F.lit("01:02:03:04:05:06")).alias("n"),
        ch.MACStringToOUI(F.lit("AB:CD:EF:04:05:06")).alias("oui"),
    ).first()
    assert r["s"] == "01:02:03:04:05:06"
    assert r["n"] == 0x010203040506
    assert r["oui"] == 0xABCDEF


def test_xml_html(spark):
    r = spark.range(1).select(
        ch.decodeXMLComponent(F.lit("&lt;a&gt; &amp;&quot;")).alias("dx"),
        ch.encodeXMLComponent(F.lit('<a>&"')).alias("ex"),
        ch.extractTextFromHTML(F.lit(
            "<html><script>var x=1;</script><style>.a{}</style>"
            "<p>Hello <b>world</b></p></html>")).alias("ht"),
        ch.firstLine(F.lit("line1\r\nline2")).alias("fl"),
    ).first()
    assert r["dx"] == '<a> &"'
    assert r["ex"] == "&lt;a&gt;&amp;&quot;"
    assert r["ht"] == "Hello world"
    assert r["fl"] == "line1"


def test_ipv4_to_ipv6_and_uuid_num(spark):
    r = spark.range(1).select(
        ch.IPv6NumToString(ch.IPv4ToIPv6(F.lit(3232235777))).alias("m"),
        ch.UUIDNumToString(ch.UUIDToNum(
            F.lit("61f0c404-5cb3-11e7-907b-a6006ad3dba0"))).alias("uu"),
        ch.IPv4NumToStringClassC(F.lit(3232235777)).alias("cc"),
    ).first()
    assert r["m"] == "::ffff:192.168.1.1"
    assert r["uu"] == "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    assert r["cc"] == "192.168.1.xxx"


def test_scalar_minhash_simhash_family(spark):
    # reference src/Functions/FunctionsStringHash.cpp (xxhash64 carrier
    # per the LIMITS.md cityHash policy)
    texts = [("the quick brown fox jumps over the lazy dog",),
             ("the quick brown fox jumps over the lazy cat",),
             ("completely different content here about spark engines",),
             ("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",),
             ("ab",), ("",)]
    df = spark.createDataFrame(texts, "t string")
    out = df.select(
        "t",
        ch.ngramSimHash(F.col("t")).alias("nsh"),
        ch.ngramSimHashCaseInsensitive(F.col("t")).alias("nshci"),
        ch.wordShingleSimHash(F.col("t")).alias("wsh"),
        ch.ngramMinHash(F.col("t")).alias("nmh"),
        ch.wordShingleMinHash(F.col("t")).alias("wmh"),
        ch.ngramMinHashArg(F.col("t")).alias("nmha"),
    ).collect()

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    r0, r1, r2, r3, r_ab, r_empty = out
    # near-dups are hamming-close, unrelated text is far
    assert ham(r0["nsh"], r1["nsh"]) < ham(r0["nsh"], r2["nsh"])
    assert ham(r0["wsh"], r1["wsh"]) < ham(r0["wsh"], r2["wsh"])
    # case-insensitive variants collapse case; sensitive ones don't
    assert r0["nshci"] == r3["nshci"] and r0["nsh"] != r3["nsh"]
    # minhash tuple halves differ; Arg variant returns the shingles
    assert r0["nmh"]["h1"] != r0["nmh"]["h2"]
    assert len(r0["nmha"]["min_args"]) == 6
    assert all(len(a) == 4 for a in r0["nmha"]["min_args"])
    # identical text -> identical tuple
    assert r0["nmh"] == out[0]["nmh"]
    # shorter than the gram size -> empty shingle set -> fingerprint 0
    assert r_ab["nsh"] == 0 and r_empty["nsh"] == 0
    assert r_ab["wsh"] != 0      # one word still forms a shingle
