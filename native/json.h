// Minimal recursive-descent JSON parser for model metadata / params.json.
// Replaces the reference's cJSON dependency (inference/*/speech_commands.h
// parse_param) with a self-contained ~150-line implementation sufficient
// for objects, arrays, strings, numbers, booleans and null.
#pragma once

#include <cctype>
#include <cstdlib>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace tsc {
namespace json {

class Value {
 public:
  enum class Kind { Null, Bool, Number, String, Array, Object };

  Kind kind = Kind::Null;
  bool b = false;
  double num = 0.0;
  std::string str;
  std::vector<Value> arr;
  std::map<std::string, Value> obj;

  bool is_object() const { return kind == Kind::Object; }
  bool is_array() const { return kind == Kind::Array; }

  const Value& operator[](const std::string& key) const {
    static const Value kNull;
    if (kind != Kind::Object) return kNull;
    auto it = obj.find(key);
    return it == obj.end() ? kNull : it->second;
  }

  double as_number() const { return kind == Kind::Bool ? (b ? 1 : 0) : num; }
  const std::string& as_string() const { return str; }

  double get_number(const std::string& key, double fallback) const {
    const Value& v = (*this)[key];
    if (v.kind == Kind::Number) return v.num;
    if (v.kind == Kind::Bool) return v.b ? 1 : 0;
    return fallback;
  }
  std::string get_string(const std::string& key,
                         const std::string& fallback) const {
    const Value& v = (*this)[key];
    return v.kind == Kind::String ? v.str : fallback;
  }
  const std::vector<Value>& get_array(const char* key) const {
    static const std::vector<Value> kEmpty;
    const Value& v = key ? (*this)[key] : *this;
    return v.kind == Kind::Array ? v.arr : kEmpty;
  }
  const std::vector<Value>& get_array(const std::string& key) const {
    return get_array(key.c_str());
  }
};

class Parser {
 public:
  explicit Parser(const std::string& text) : s_(text) {}

  Value parse() {
    Value v = value();
    ws();
    return v;
  }

 private:
  const std::string& s_;
  size_t i_ = 0;

  [[noreturn]] void fail(const char* what) {
    throw std::runtime_error(std::string("json parse error: ") + what);
  }
  void ws() {
    while (i_ < s_.size() && std::isspace(static_cast<unsigned char>(s_[i_])))
      ++i_;
  }
  char peek() {
    if (i_ >= s_.size()) fail("unexpected end");
    return s_[i_];
  }
  void expect(char c) {
    if (i_ >= s_.size() || s_[i_] != c) fail("unexpected char");
    ++i_;
  }

  Value value() {
    ws();
    switch (peek()) {
      case '{': return object();
      case '[': return array();
      case '"': return string_value();
      case 't': literal("true"); return make_bool(true);
      case 'f': literal("false"); return make_bool(false);
      case 'n': literal("null"); return Value{};
      default: return number();
    }
  }

  static Value make_bool(bool b) {
    Value v;
    v.kind = Value::Kind::Bool;
    v.b = b;
    return v;
  }

  void literal(const char* lit) {
    for (const char* p = lit; *p; ++p) expect(*p);
  }

  Value object() {
    Value v;
    v.kind = Value::Kind::Object;
    expect('{');
    ws();
    if (peek() == '}') { ++i_; return v; }
    while (true) {
      ws();
      Value key = string_value();
      ws();
      expect(':');
      v.obj.emplace(key.str, value());
      ws();
      if (peek() == ',') { ++i_; continue; }
      expect('}');
      return v;
    }
  }

  Value array() {
    Value v;
    v.kind = Value::Kind::Array;
    expect('[');
    ws();
    if (peek() == ']') { ++i_; return v; }
    while (true) {
      v.arr.push_back(value());
      ws();
      if (peek() == ',') { ++i_; continue; }
      expect(']');
      return v;
    }
  }

  Value string_value() {
    Value v;
    v.kind = Value::Kind::String;
    expect('"');
    while (true) {
      char c = peek();
      ++i_;
      if (c == '"') break;
      if (c == '\\') {
        char esc = peek();
        ++i_;
        switch (esc) {
          case 'n': v.str += '\n'; break;
          case 't': v.str += '\t'; break;
          case 'r': v.str += '\r'; break;
          case 'b': v.str += '\b'; break;
          case 'f': v.str += '\f'; break;
          case 'u': {  // basic BMP escape
            if (i_ + 4 > s_.size()) fail("bad \\u escape");
            int code = std::strtol(s_.substr(i_, 4).c_str(), nullptr, 16);
            i_ += 4;
            if (code < 0x80) {
              v.str += static_cast<char>(code);
            } else if (code < 0x800) {
              v.str += static_cast<char>(0xC0 | (code >> 6));
              v.str += static_cast<char>(0x80 | (code & 0x3F));
            } else {
              v.str += static_cast<char>(0xE0 | (code >> 12));
              v.str += static_cast<char>(0x80 | ((code >> 6) & 0x3F));
              v.str += static_cast<char>(0x80 | (code & 0x3F));
            }
            break;
          }
          default: v.str += esc;
        }
      } else {
        v.str += c;
      }
    }
    return v;
  }

  Value number() {
    size_t start = i_;
    while (i_ < s_.size() &&
           (std::isdigit(static_cast<unsigned char>(s_[i_])) || s_[i_] == '-' ||
            s_[i_] == '+' || s_[i_] == '.' || s_[i_] == 'e' || s_[i_] == 'E'))
      ++i_;
    if (i_ == start) fail("bad number");
    Value v;
    v.kind = Value::Kind::Number;
    v.num = std::strtod(s_.substr(start, i_ - start).c_str(), nullptr);
    return v;
  }
};

inline Value parse(const std::string& text) { return Parser(text).parse(); }

}  // namespace json
}  // namespace tsc
