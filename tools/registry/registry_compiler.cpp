// registry_compiler — native registry/schema compiler.
//
// TPU-native equivalent of the reference's build-time registry toolchain
// (ref: src/tools/registry/{parse.c,gen_inc.c} which compile each core's
// Registry.xml into Fortran include files, and src/tools/input_gen/
// {namelist_gen.c,streams_gen.c} which emit default run files). Instead of
// Fortran .inc files, this emits the artifacts the Python/JAX runtime
// consumes:
//
//   registry_compiler Registry.xml --config-py cfg.py   (namelist dataclass)
//   registry_compiler Registry.xml --schema-json s.json (field/dim/package
//                                                        /stream schema)
//   registry_compiler Registry.xml --namelist nml       (default namelist)
//   registry_compiler Registry.xml --streams streams.xml(default streams)
//
// The XML parser below is a deliberately small ezxml-equivalent (ref:
// src/external/ezxml/ezxml.c) sufficient for the Registry dialect:
// elements, attributes, comments; cpp directives (#ifdef...) are stripped
// like the reference's CPP preprocessing pass (ref: src/Makefile:39).

#include <cctype>
#include <functional>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct XmlNode {
  std::string name;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const std::string &attr(const std::string &k) const {
    static const std::string empty;
    auto it = attrs.find(k);
    return it == attrs.end() ? empty : it->second;
  }
  std::vector<const XmlNode *> find(const std::string &tag) const {
    std::vector<const XmlNode *> out;
    for (const auto &c : children)
      if (c->name == tag) out.push_back(c.get());
    return out;
  }
};

class XmlParser {
 public:
  explicit XmlParser(std::string text) : s_(std::move(text)) {}

  std::unique_ptr<XmlNode> parse() {
    skip_misc();
    return parse_element();
  }

 private:
  std::string s_;
  size_t p_ = 0;

  bool starts(const char *t) const { return s_.compare(p_, strlen(t), t) == 0; }
  void skip_ws() {
    while (p_ < s_.size() && isspace((unsigned char)s_[p_])) p_++;
  }
  void skip_misc() {
    for (;;) {
      skip_ws();
      if (starts("<?")) {
        p_ = s_.find("?>", p_) + 2;
      } else if (starts("<!--")) {
        p_ = s_.find("-->", p_) + 3;
      } else {
        break;
      }
    }
  }
  std::string read_name() {
    size_t b = p_;
    while (p_ < s_.size() &&
           (isalnum((unsigned char)s_[p_]) || s_[p_] == '_' || s_[p_] == '-'))
      p_++;
    return s_.substr(b, p_ - b);
  }
  std::unique_ptr<XmlNode> parse_element() {
    if (p_ >= s_.size() || s_[p_] != '<') return nullptr;
    p_++;  // '<'
    auto node = std::make_unique<XmlNode>();
    node->name = read_name();
    for (;;) {
      skip_ws();
      if (p_ >= s_.size()) break;
      if (s_[p_] == '/') {        // self-closing
        p_ += 2;                  // "/>"
        return node;
      }
      if (s_[p_] == '>') {        // children follow
        p_++;
        for (;;) {
          skip_misc();
          size_t lt = s_.find('<', p_);
          if (lt == std::string::npos) return node;
          p_ = lt;
          if (starts("<!--")) {
            p_ = s_.find("-->", p_) + 3;
            continue;
          }
          if (s_[p_ + 1] == '/') {  // closing tag
            p_ = s_.find('>', p_) + 1;
            return node;
          }
          auto child = parse_element();
          if (child) node->children.push_back(std::move(child));
        }
      }
      // attribute
      std::string key = read_name();
      skip_ws();
      if (s_[p_] == '=') {
        p_++;
        skip_ws();
        char q = s_[p_++];
        size_t b = p_;
        while (p_ < s_.size() && s_[p_] != q) p_++;
        node->attrs[key] = s_.substr(b, p_ - b);
        p_++;
      }
    }
    return node;
  }
};

std::string strip_cpp(const std::string &in) {
  // ref: Registry files are CPP-preprocessed before parsing
  // (src/core_atmosphere/Makefile:21-24); here #-directives are dropped and
  // all branches kept (every optional field stays in the schema).
  std::istringstream is(in);
  std::ostringstream os;
  std::string line;
  while (std::getline(is, line)) {
    size_t i = line.find_first_not_of(" \t");
    if (i != std::string::npos && line[i] == '#') continue;
    os << line << "\n";
  }
  return os.str();
}

std::string py_default(const std::string &type, std::string v) {
  if (type == "character") return "\"" + v + "\"";
  if (type == "logical") {
    for (auto &c : v) c = (char)tolower(c);
    return (v.find("true") != std::string::npos || v == "t") ? "True"
                                                             : "False";
  }
  if (type == "real") {
    if (v.find('.') == std::string::npos &&
        v.find('e') == std::string::npos && v.find('E') == std::string::npos)
      v += ".0";
    return v;
  }
  return v;  // integer
}

void emit_config_py(const XmlNode &reg, std::ostream &out) {
  const std::string core = reg.attr("core");
  out << "# Generated by registry_compiler from Registry.xml (core: " << core
      << ")\n# Namelist schema — the gen_inc.c setup_namelist equivalent.\n"
      << "import dataclasses\n\n\n"
      << "@dataclasses.dataclass(frozen=True)\n"
      << "class Config:\n";
  bool any = false;
  for (const auto *rec : reg.find("nml_record")) {
    out << "    # &" << rec->attr("name") << "\n";
    for (const auto *opt : rec->find("nml_option")) {
      out << "    " << opt->attr("name") << ": "
          << (opt->attr("type") == "character"
                  ? "str"
                  : opt->attr("type") == "logical"
                        ? "bool"
                        : opt->attr("type") == "real" ? "float" : "int")
          << " = " << py_default(opt->attr("type"),
                                 opt->attr("default_value"))
          << "\n";
      any = true;
    }
  }
  if (!any) out << "    pass\n";
}

void emit_json(const XmlNode &reg, std::ostream &out) {
  auto esc = [](const std::string &s) { return s; };
  out << "{\n  \"core\": \"" << reg.attr("core") << "\",\n";
  out << "  \"dims\": {";
  bool first = true;
  for (const auto *dims : reg.find("dims"))
    for (const auto *d : dims->find("dim")) {
      out << (first ? "" : ", ") << "\"" << d->attr("name") << "\": \""
          << d->attr("definition") << "\"";
      first = false;
    }
  out << "},\n  \"packages\": [";
  first = true;
  for (const auto *pkgs : reg.find("packages"))
    for (const auto *p : pkgs->find("package")) {
      out << (first ? "" : ", ") << "\"" << p->attr("name") << "\"";
      first = false;
    }
  out << "],\n  \"var_structs\": {\n";
  bool fs = true;
  for (const auto *vs : reg.find("var_struct")) {
    if (!fs) out << ",\n";
    fs = false;
    out << "    \"" << vs->attr("name") << "\": {\"time_levs\": "
        << (vs->attr("time_levs").empty() ? "1" : vs->attr("time_levs"))
        << ", \"vars\": [";
    bool fv = true;
    std::function<void(const XmlNode &)> walk = [&](const XmlNode &n) {
      for (const auto &c : n.children) {
        if (c->name == "var" || c->name == "var_array") {
          if (!fv) out << ", ";
          fv = false;
          out << "{\"name\": \"" << c->attr("name") << "\", \"type\": \""
              << c->attr("type") << "\", \"dims\": \""
              << c->attr("dimensions") << "\", \"packages\": \""
              << c->attr("packages") << "\", \"array\": "
              << (c->name == "var_array" ? "true" : "false") << "}";
          if (c->name == "var_array") walk(*c);
        }
      }
    };
    walk(*vs);
    out << "]}";
  }
  out << "\n  },\n  \"streams\": [";
  first = true;
  for (const auto *ss : reg.find("streams"))
    for (const auto *st : ss->find("stream")) {
      out << (first ? "" : ", ") << "{\"name\": \"" << st->attr("name")
          << "\", \"type\": \"" << st->attr("type")
          << "\", \"filename_template\": \""
          << esc(st->attr("filename_template")) << "\"}";
      first = false;
    }
  out << "]\n}\n";
}

void emit_namelist(const XmlNode &reg, std::ostream &out) {
  // ref: src/tools/input_gen/namelist_gen.c
  for (const auto *rec : reg.find("nml_record")) {
    out << "&" << rec->attr("name") << "\n";
    for (const auto *opt : rec->find("nml_option")) {
      if (opt->attr("in_defaults") == "false") continue;
      std::string v = opt->attr("default_value");
      if (opt->attr("type") == "character") v = "'" + v + "'";
      if (opt->attr("type") == "logical")
        v = (v.find("true") != std::string::npos) ? ".true." : ".false.";
      out << "    " << opt->attr("name") << " = " << v << "\n";
    }
    out << "/\n";
  }
}

void emit_streams(const XmlNode &reg, std::ostream &out) {
  // ref: src/tools/input_gen/streams_gen.c
  out << "<streams>\n";
  for (const auto *ss : reg.find("streams"))
    for (const auto *st : ss->find("stream")) {
      out << "<immutable_stream name=\"" << st->attr("name") << "\"\n"
          << "                  type=\"" << st->attr("type") << "\"\n"
          << "                  filename_template=\""
          << st->attr("filename_template") << "\"";
      if (!st->attr("input_interval").empty())
        out << "\n                  input_interval=\""
            << st->attr("input_interval") << "\"";
      if (!st->attr("output_interval").empty())
        out << "\n                  output_interval=\""
            << st->attr("output_interval") << "\"";
      out << "/>\n\n";
    }
  out << "</streams>\n";
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: registry_compiler Registry.xml --config-py|"
                 "--schema-json|--namelist|--streams [out]\n";
    return 2;
  }
  std::ifstream f(argv[1]);
  if (!f) {
    std::cerr << "cannot open " << argv[1] << "\n";
    return 1;
  }
  std::stringstream buf;
  buf << f.rdbuf();
  XmlParser parser(strip_cpp(buf.str()));
  auto root = parser.parse();
  if (!root || root->name != "registry") {
    std::cerr << "not a registry file\n";
    return 1;
  }
  std::ostream *out = &std::cout;
  std::ofstream of;
  if (argc > 3) {
    of.open(argv[3]);
    out = &of;
  }
  std::string mode = argv[2];
  if (mode == "--config-py")
    emit_config_py(*root, *out);
  else if (mode == "--schema-json")
    emit_json(*root, *out);
  else if (mode == "--namelist")
    emit_namelist(*root, *out);
  else if (mode == "--streams")
    emit_streams(*root, *out);
  else {
    std::cerr << "unknown mode " << mode << "\n";
    return 2;
  }
  return 0;
}
