// VQA answer normalization + accuracy scoring — native hot loop.
//
// Semantics mirror the official VQA protocol exactly as implemented in
// ../utils/vqa_eval.py (which itself preserves the official code's
// idiosyncrasies: condition-on-original punctuation replacement, the
// miswritten period regex, and the max-32-period-replacements cap).
// The data tables below are GENERATED from the canonical Python spec.

#include <algorithm>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

const std::unordered_map<std::string, std::string> kContractions = {
    {"aint", "ain't"},
    {"arent", "aren't"},
    {"cant", "can't"},
    {"couldve", "could've"},
    {"couldnt", "couldn't"},
    {"couldn'tve", "couldn't've"},
    {"couldnt've", "couldn't've"},
    {"didnt", "didn't"},
    {"doesnt", "doesn't"},
    {"dont", "don't"},
    {"hadnt", "hadn't"},
    {"hadnt've", "hadn't've"},
    {"hadn'tve", "hadn't've"},
    {"hasnt", "hasn't"},
    {"havent", "haven't"},
    {"hed", "he'd"},
    {"hed've", "he'd've"},
    {"he'dve", "he'd've"},
    {"hes", "he's"},
    {"howd", "how'd"},
    {"howll", "how'll"},
    {"hows", "how's"},
    {"Id've", "I'd've"},
    {"I'dve", "I'd've"},
    {"Im", "I'm"},
    {"Ive", "I've"},
    {"isnt", "isn't"},
    {"itd", "it'd"},
    {"itd've", "it'd've"},
    {"it'dve", "it'd've"},
    {"itll", "it'll"},
    {"let's", "let's"},
    {"maam", "ma'am"},
    {"mightnt", "mightn't"},
    {"mightnt've", "mightn't've"},
    {"mightn'tve", "mightn't've"},
    {"mightve", "might've"},
    {"mustnt", "mustn't"},
    {"mustve", "must've"},
    {"neednt", "needn't"},
    {"notve", "not've"},
    {"oclock", "o'clock"},
    {"oughtnt", "oughtn't"},
    {"ow's'at", "'ow's'at"},
    {"'ows'at", "'ow's'at"},
    {"'ow'sat", "'ow's'at"},
    {"shant", "shan't"},
    {"shed've", "she'd've"},
    {"she'dve", "she'd've"},
    {"she's", "she's"},
    {"shouldve", "should've"},
    {"shouldnt", "shouldn't"},
    {"shouldnt've", "shouldn't've"},
    {"shouldn'tve", "shouldn't've"},
    {"somebody'd", "somebodyd"},
    {"somebodyd've", "somebody'd've"},
    {"somebody'dve", "somebody'd've"},
    {"somebodyll", "somebody'll"},
    {"somebodys", "somebody's"},
    {"someoned", "someone'd"},
    {"someoned've", "someone'd've"},
    {"someone'dve", "someone'd've"},
    {"someonell", "someone'll"},
    {"someones", "someone's"},
    {"somethingd", "something'd"},
    {"somethingd've", "something'd've"},
    {"something'dve", "something'd've"},
    {"somethingll", "something'll"},
    {"thats", "that's"},
    {"thered", "there'd"},
    {"thered've", "there'd've"},
    {"there'dve", "there'd've"},
    {"therere", "there're"},
    {"theres", "there's"},
    {"theyd", "they'd"},
    {"theyd've", "they'd've"},
    {"they'dve", "they'd've"},
    {"theyll", "they'll"},
    {"theyre", "they're"},
    {"theyve", "they've"},
    {"twas", "'twas"},
    {"wasnt", "wasn't"},
    {"wed've", "we'd've"},
    {"we'dve", "we'd've"},
    {"weve", "we've"},
    {"werent", "weren't"},
    {"whatll", "what'll"},
    {"whatre", "what're"},
    {"whats", "what's"},
    {"whatve", "what've"},
    {"whens", "when's"},
    {"whered", "where'd"},
    {"wheres", "where's"},
    {"whereve", "where've"},
    {"whod", "who'd"},
    {"whod've", "who'd've"},
    {"who'dve", "who'd've"},
    {"wholl", "who'll"},
    {"whos", "who's"},
    {"whove", "who've"},
    {"whyll", "why'll"},
    {"whyre", "why're"},
    {"whys", "why's"},
    {"wont", "won't"},
    {"wouldve", "would've"},
    {"wouldnt", "wouldn't"},
    {"wouldnt've", "wouldn't've"},
    {"wouldn'tve", "wouldn't've"},
    {"yall", "y'all"},
    {"yall'll", "y'all'll"},
    {"y'allll", "y'all'll"},
    {"yall'd've", "y'all'd've"},
    {"y'alld've", "y'all'd've"},
    {"y'all'dve", "y'all'd've"},
    {"youd", "you'd"},
    {"youd've", "you'd've"},
    {"you'dve", "you'd've"},
    {"youll", "you'll"},
    {"youre", "you're"},
    {"youve", "you've"}
};

const std::unordered_map<std::string, std::string> kManualMap = {
    {"none", "0"},
    {"zero", "0"},
    {"one", "1"},
    {"two", "2"},
    {"three", "3"},
    {"four", "4"},
    {"five", "5"},
    {"six", "6"},
    {"seven", "7"},
    {"eight", "8"},
    {"nine", "9"},
    {"ten", "10"}
};

const std::unordered_set<std::string> kArticles = {"a", "an", "the"};

const char* kPunct[] = {";", "/", "[", "]", "\"", "{", "}", "(", ")", "=", "+", "\\", "_", "-", ">", "<", "@", "`", ",", "?", "!"};
const int kNumPunct = sizeof(kPunct) / sizeof(kPunct[0]);

bool is_digit(char c) { return c >= '0' && c <= '9'; }

// digit ',' digit anywhere (commaStrip)
bool has_numeric_comma(const std::string& s) {
  for (size_t i = 1; i + 1 < s.size(); ++i) {
    if (s[i] == ',' && is_digit(s[i - 1]) && is_digit(s[i + 1])) return true;
  }
  return false;
}

std::string replace_all(const std::string& s, const std::string& from,
                        const std::string& to) {
  if (from.empty()) return s;
  std::string out;
  out.reserve(s.size());
  size_t pos = 0;
  while (true) {
    size_t hit = s.find(from, pos);
    if (hit == std::string::npos) {
      out.append(s, pos, std::string::npos);
      return out;
    }
    out.append(s, pos, hit - pos);
    out.append(to);
    pos = hit + from.size();
  }
}

std::string clean_ws(const std::string& in) {
  std::string s = in;
  std::replace(s.begin(), s.end(), '\n', ' ');
  std::replace(s.begin(), s.end(), '\t', ' ');
  size_t a = s.find_first_not_of(" \t\n\r\f\v");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\n\r\f\v");
  return s.substr(a, b - a + 1);
}

std::string process_punctuation(const std::string& text) {
  std::string out = text;
  bool numeric_comma = has_numeric_comma(text);
  for (int i = 0; i < kNumPunct; ++i) {
    std::string p(kPunct[i]);
    bool del = numeric_comma || text.find(p + " ") != std::string::npos ||
               text.find(" " + p) != std::string::npos;
    out = replace_all(out, p, del ? "" : " ");
  }
  // periodStrip: remove '.' not followed by a digit; the official code
  // passes re.UNICODE (=32) as the COUNT argument, capping replacements
  std::string res;
  res.reserve(out.size());
  int removed = 0;
  for (size_t i = 0; i < out.size(); ++i) {
    if (out[i] == '.' && removed < 32 &&
        (i + 1 >= out.size() || !is_digit(out[i + 1]))) {
      ++removed;
      continue;
    }
    res += out[i];
  }
  return res;
}

std::string process_digit_article(const std::string& text) {
  std::string lower = text;
  std::transform(lower.begin(), lower.end(), lower.begin(),
                 [](unsigned char c) { return std::tolower(c); });
  std::vector<std::string> words;
  size_t pos = 0;
  while (pos < lower.size()) {
    while (pos < lower.size() && std::isspace((unsigned char)lower[pos]))
      ++pos;
    size_t start = pos;
    while (pos < lower.size() && !std::isspace((unsigned char)lower[pos]))
      ++pos;
    if (pos > start) {
      std::string w = lower.substr(start, pos - start);
      auto it = kManualMap.find(w);
      if (it != kManualMap.end()) w = it->second;
      if (!kArticles.count(w)) words.push_back(w);
    }
  }
  std::string out;
  for (size_t i = 0; i < words.size(); ++i) {
    auto it = kContractions.find(words[i]);
    if (i) out += " ";
    out += (it != kContractions.end()) ? it->second : words[i];
  }
  return out;
}

std::string normalize(const std::string& text) {
  return process_digit_article(process_punctuation(clean_ws(text)));
}

}  // namespace

extern "C" {

// Normalize a single answer. Returns bytes written (excl. NUL), or -1 if
// the buffer is too small.
int vqa_normalize(const char* input, char* output, int cap) {
  std::string out = normalize(std::string(input));
  if ((int)out.size() + 1 > cap) return -1;
  std::memcpy(output, out.c_str(), out.size() + 1);
  return (int)out.size();
}

// Official per-question accuracy over n_q questions with n_ann annotators.
// gt: flattened [n_q * n_ann] answer strings; preds: [n_q].
// out: [n_q] accuracies in [0, 1].
void vqa_accuracies(const char** gt, const char** preds, int n_q, int n_ann,
                    double* out) {
  std::vector<std::string> answers(n_ann);
  for (int q = 0; q < n_q; ++q) {
    std::string pred = clean_ws(preds[q]);
    bool all_same = true;
    for (int a = 0; a < n_ann; ++a) {
      answers[a] = clean_ws(gt[q * n_ann + a]);
      if (a && answers[a] != answers[0]) all_same = false;
    }
    if (!all_same) {  // normalization only applies on disagreement
      for (int a = 0; a < n_ann; ++a)
        answers[a] = process_digit_article(process_punctuation(answers[a]));
      pred = process_digit_article(process_punctuation(pred));
    }
    double total = 0.0;
    for (int a = 0; a < n_ann; ++a) {
      int matches = 0;
      for (int b = 0; b < n_ann; ++b) {
        if (b != a && answers[b] == pred) ++matches;
      }
      double acc = matches / 3.0;
      total += acc < 1.0 ? acc : 1.0;
    }
    out[q] = total / n_ann;
  }
}

}  // extern "C"
